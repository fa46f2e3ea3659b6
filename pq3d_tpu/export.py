"""Ahead-of-time model export: serialized StableHLO serving artifacts.

``jax.export`` lowers a jitted forward to a versioned, self-contained
StableHLO artifact (params baked in as constants) that a serving host can
load and run WITHOUT the model's Python code — the deployment-boundary
piece the reference delegates to torch checkpoints + its own codebase
(reference: trainer/build.py:176-186 can only re-load weights into the
same Python model).

TPU-native detail: ``platforms=("tpu",)`` cross-lowers FOR TPU from any
host (e.g. a CPU CI box), so artifacts can be built off-cluster and shipped
to TPU serving fleets; ``("cpu", "tpu")`` produces one artifact that runs
on both.

Typical flow::

    blob = export_forward(model, variables, example_batch)
    Path("model.bin").write_bytes(blob)
    # serving host (no pq3d_tpu model code needed):
    fn = load_forward(Path("model.bin").read_bytes())
    out = fn(batch)           # same pytree the model's apply() returns
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence


def export_forward(model, variables, example_batch: Dict[str, Any],
                   outputs: Optional[Sequence[str]] = None,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``model.apply(variables, batch, train=False)`` to bytes.

    Args:
      model: a flax module with the standard ``apply(v, batch, train=...)``
        signature (Query3DUnified or any sub-model).
      variables: the trained variables pytree — baked into the artifact.
      example_batch: device-ready batch fixing every input shape/dtype
        (export is shape-specialized, matching the framework's static-shape
        serving discipline).
      outputs: optional key subset of the model's output dict (e.g.
        ``("predictions_class", "predictions_mask")``) to shrink the
        artifact's result pytree.
      platforms: lowering platforms, default ("cpu", "tpu").
    """
    import jax
    from jax import export as jex
    import jax.numpy as jnp

    def fwd(batch):
        out = model.apply(variables, batch, train=False)
        if outputs is not None:
            out = {k: out[k] for k in outputs if k in out}
        return out

    args = jax.tree.map(jnp.asarray, example_batch)
    exported = jex.export(
        jax.jit(fwd), platforms=list(platforms or ("cpu", "tpu")))(args)
    return bytes(exported.serialize())


def load_forward(blob: bytes) -> Callable[[Dict[str, Any]], Any]:
    """Deserialize an exported artifact into a callable ``fn(batch)``.

    The call is jitted (XLA compiles the embedded StableHLO for the local
    backend); inputs must match the exported shapes/dtypes exactly.
    """
    import jax
    from jax import export as jex

    exported = jex.deserialize(blob)
    return jax.jit(exported.call)


def exported_platforms(blob: bytes) -> tuple:
    """The platforms an artifact was lowered for (sanity/deploy checks)."""
    from jax import export as jex
    return tuple(jex.deserialize(blob).platforms)
