"""Tokenizer wiring: HF CLIP/T5 tokenizers when available, synthetic
fallback otherwise.

The reference couples tokenizer choice to the text encoder and generation
head (reference: trainer/build.py:84-94 picks the CLIP tokenizer for
CLIPLanguageEncoder, data/datasets/scanfamily_wrapper.py:8-45 pre-tokenizes
sentences, trainer/multitask_trainer.py:138-145 decodes T5 output).  Here
the config keys ``data_wrapper.tokenizer`` / ``data_wrapper.
generation_tokenizer`` name HF tokenizers; in a zero-egress environment
without an HF cache we fall back to the synthetic closed-vocabulary
tokenizer so the full stack still runs (with a loud warning).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Callable, List, Optional

log = logging.getLogger(__name__)


class SyntheticTokenize:
    """Picklable synthetic tokenizer (spawn-pool workers pickle the
    dataset, so tokenizer callables must round-trip through pickle —
    lambdas/closures do not)."""

    def __init__(self, max_length: int = 77):
        self.max_length = max_length

    def __call__(self, s: str) -> List[int]:
        return [ord(c) % 1000 for c in s][: self.max_length]


class HFTokenize:
    """Picklable HF tokenizer wrapper: pickles by name, reloads lazily in
    the worker process (the HF fast-tokenizer object itself pickles, but
    shipping just the name keeps worker init cheap and version-safe)."""

    def __init__(self, name: str, max_length: int):
        self.name = name
        self.max_length = max_length
        self._t = None

    def _tok(self):
        if self._t is None:
            from transformers import AutoTokenizer
            self._t = AutoTokenizer.from_pretrained(self.name)
        return self._t

    def __call__(self, s: str) -> List[int]:
        return list(self._tok()(s, truncation=True,
                                max_length=self.max_length).input_ids)

    def __getstate__(self):
        return {"name": self.name, "max_length": self.max_length}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._t = None


class HFDetokenize:
    """Picklable ids -> text decoder for the generation tokenizer."""

    def __init__(self, name: str):
        self.name = name
        self._t = None

    def __call__(self, ids) -> str:
        import numpy as np
        if self._t is None:
            from transformers import AutoTokenizer
            self._t = AutoTokenizer.from_pretrained(self.name)
        ids = [int(i) for i in np.asarray(ids).tolist() if int(i) > 0]
        return self._t.decode(ids, skip_special_tokens=True)

    def __getstate__(self):
        return {"name": self.name}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._t = None


@dataclasses.dataclass
class TokenizerBundle:
    """Prompt tokenizer (text -> ids), generation tokenizer (response text
    -> ids for T5 teacher forcing) and detokenizer (ids -> text)."""
    tokenize: Callable[[str], List[int]]
    gen_tokenize: Callable[[str], List[int]]
    detokenize: Callable[[object], str]
    prompt_name: str = "synthetic"
    gen_name: str = "synthetic"

    @property
    def is_real(self) -> bool:
        return self.prompt_name != "synthetic" and self.gen_name != "synthetic"


def _load_hf(name: Optional[str]):
    if not name:
        return None
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(str(name))
    except Exception as e:  # offline / no cache / bad name
        log.warning("HF tokenizer %r unavailable (%s: %s) — falling back to "
                    "the synthetic tokenizer; real-data text will NOT be in "
                    "the model's vocab space", name, type(e).__name__,
                    str(e)[:120])
        return None


def build_tokenizers(cfg) -> TokenizerBundle:
    """Resolve tokenizers from ``cfg.data_wrapper`` (dead-config fix: these
    keys now actually reach the datasets)."""
    dw = cfg.get("data_wrapper", {}) or {}
    prompt_name = dw.get("tokenizer") if hasattr(dw, "get") else None
    gen_name = dw.get("generation_tokenizer") if hasattr(dw, "get") else None

    prompt_tok = _load_hf(prompt_name)
    gen_tok = _load_hf(gen_name)

    if prompt_tok is not None:
        tokenize = HFTokenize(str(prompt_name), max_length=77)
        tokenize._t = prompt_tok
        p_name = str(prompt_name)
    else:
        tokenize, p_name = SyntheticTokenize(77), "synthetic"

    if gen_tok is not None:
        gen_tokenize = HFTokenize(str(gen_name), max_length=64)
        gen_tokenize._t = gen_tok
        detokenize = HFDetokenize(str(gen_name))
        detokenize._t = gen_tok
        g_name = str(gen_name)
    else:
        from pq3d_tpu.data.unified_datasets import detokenize as _syn_detok
        gen_tokenize, detokenize, g_name = (SyntheticTokenize(64), _syn_detok,
                                            "synthetic")

    return TokenizerBundle(tokenize=tokenize, gen_tokenize=gen_tokenize,
                           detokenize=detokenize, prompt_name=p_name,
                           gen_name=g_name)
