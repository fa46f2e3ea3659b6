"""Hungarian set-criterion parity vs the ACTUAL reference implementation
(modules/third_party/mask3d/criterion.py SetCriterion + matcher.py
HungarianMatcher — pure torch + scipy, importable on CPU).

Runs both criteria on identical multi-round predictions and targets and
compares every weighted loss component and the matching indices.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

B, Q, S, C = 2, 10, 14, 8          # scenes, queries, segments, classes
ROUNDS = 3
MS = [3, 5]                        # true instances per scene
SS = [12, 14]                      # true segments per scene


def _install_stubs():
    from _ref_stubs import install
    install()


@pytest.fixture(scope="module")
def ref_criterion():
    _install_stubs()
    import importlib
    matcher_mod = importlib.import_module(
        "modules.third_party.mask3d.matcher")
    crit_mod = importlib.import_module(
        "modules.third_party.mask3d.criterion")
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_mask=5.0, cost_dice=2.0, num_points=-1,
        ignore_label=-100)
    weight_dict = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 2.0}
    for i in range(ROUNDS - 1):
        weight_dict.update({f"{k}_{i}": v
                            for k, v in list(weight_dict.items())[:3]})
    crit = crit_mod.SetCriterion(
        num_classes=C, matcher=matcher, weight_dict=weight_dict,
        losses=["labels", "masks"], num_points=-1, class_weights=-1,
        ignore_label=-100)
    return crit, weight_dict


def _data(rng):
    preds_class = [rng.standard_normal((B, Q, C + 1)).astype(np.float32)
                   for _ in range(ROUNDS)]
    preds_mask = [rng.standard_normal((B, S, Q)).astype(np.float32)
                  for _ in range(ROUNDS)]
    labels = rng.integers(0, C, (B, max(MS))).astype(np.int32)
    seg_masks = rng.random((B, max(MS), S)) < 0.35
    for b, (m, s) in enumerate(zip(MS, SS)):
        seg_masks[b, :, s:] = False
    return preds_class, preds_mask, labels, seg_masks


def test_set_criterion_matches_reference(ref_criterion):
    from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss

    crit, weight_dict = ref_criterion
    rng = np.random.default_rng(0)
    preds_class, preds_mask, labels, seg_masks = _data(rng)

    # ---- reference -------------------------------------------------------
    t_labels = [torch.from_numpy(labels[b, :MS[b]].astype(np.int64))
                for b in range(B)]
    t_masks = [torch.from_numpy(seg_masks[b, :MS[b], :SS[b]].astype(
        np.float32)) for b in range(B)]
    t_pc = [torch.from_numpy(p) for p in preds_class]
    t_pm = [[torch.from_numpy(preds_mask[r][b, :SS[b]]) for b in range(B)]
            for r in range(ROUNDS)]
    with torch.no_grad():
        losses, indices = crit(t_pm, t_pc, t_labels, t_masks)
    ref_total = float(sum(losses[k] * weight_dict[k] for k in losses))

    # ---- ours ------------------------------------------------------------
    batch = {
        "instance_labels": jnp.asarray(labels),
        "segment_masks": jnp.asarray(seg_masks),
        "instance_valid": jnp.asarray(
            np.arange(max(MS))[None, :] < np.asarray(MS)[:, None]),
        "seg_pad_masks": jnp.asarray(
            np.arange(S)[None, :] < np.asarray(SS)[:, None]),
    }
    cfg = InstSegLossConfig(num_classes=C, cost_class=2.0, cost_mask=5.0,
                            cost_dice=2.0, ignore_label=-100)
    total, metrics = instseg_set_loss(
        [jnp.asarray(p) for p in preds_class],
        [jnp.asarray(p) for p in preds_mask], batch, cfg)

    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    # component-level agreement for the final round
    for k_ref, k_ours in (("loss_ce", "loss_ce"), ("loss_mask", "loss_bce"),
                          ("loss_dice", "loss_dice")):
        if k_ours in metrics:
            np.testing.assert_allclose(
                float(metrics[k_ours]),
                float(losses[k_ref] * weight_dict[k_ref]), rtol=2e-4,
                err_msg=k_ours)


def test_direct_criterion_matches_reference(ref_criterion):
    """DirectCriterion (GT-matched, no Hungarian) parity vs the reference
    optim/loss/instseg_loss.py DirectCriterion."""
    _install_stubs()
    import importlib
    ref_mod = importlib.import_module("optim.loss.instseg_loss")
    crit = ref_mod.DirectCriterion(losses=["labels", "masks"],
                                   ignore_label=-100)

    from pq3d_tpu.optim.losses import instseg_direct_loss
    rng = np.random.default_rng(3)
    m = 6
    preds_class = [rng.standard_normal((B, m, C + 1)).astype(np.float32)
                   for _ in range(ROUNDS)]
    preds_mask = [rng.standard_normal((B, S, m)).astype(np.float32)
                  for _ in range(ROUNDS)]
    labels = rng.integers(0, C, (B, m)).astype(np.int64)
    labels[0, 4:] = -100                       # padded/ignored instances
    tgt = (rng.random((B, m, S)) < 0.4).astype(np.float32)
    pad = rng.random((B, m, S)) < 0.9
    pad[0, 4:] = False

    with torch.no_grad():
        ref = crit([torch.from_numpy(p) for p in preds_mask],
                   [torch.from_numpy(p) for p in preds_class],
                   torch.from_numpy(tgt),
                   torch.from_numpy(pad),
                   torch.from_numpy(labels.copy()))

    batch = {"target_labels": jnp.asarray(labels),
             "target_masks": jnp.asarray(tgt),
             "target_masks_pad_masks": jnp.asarray(pad)}
    total, met = instseg_direct_loss(
        [jnp.asarray(p) for p in preds_class],
        [jnp.asarray(p) for p in preds_mask], batch)
    for k in ("loss_ce", "loss_mask", "loss_dice"):
        np.testing.assert_allclose(float(met[k]) if k in met
                                   else float(met[k.replace("mask", "bce")]),
                                   float(ref[k]), rtol=1e-5, err_msg=k)


def test_schedule_curves_match_reference():
    """warmup_cosine / warmup_exp multipliers == the reference's lambdas
    (optim/scheduler.py — imported directly)."""
    _install_stubs()
    import importlib
    ref = importlib.import_module("optim.scheduler")
    from pq3d_tpu.optim.optimizers import make_schedule

    total, warm = 1000, 100
    for name, kw in (("warmup_cosine", {}), ("warmup_exp", {"gamma": 0.1}),
                     ("constant", {})):
        ours = make_schedule(name, 1.0, total, warm, **kw)
        for step in (0, 1, 50, 100, 101, 400, 999):
            want = getattr(ref, name)(step, warm, total, **kw)
            np.testing.assert_allclose(float(ours(step)), want, rtol=1e-6,
                                       err_msg=f"{name}@{step}")


def test_lion_matches_reference():
    """One-step + multi-step Lion parity vs the reference implementation
    (optim/optimizer/lion.py — decoupled wd, sign update, post-update
    momentum decay)."""
    _install_stubs()
    import importlib
    lion_mod = importlib.import_module("optim.optimizer.lion")

    import jax
    import optax

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((5, 4)).astype(np.float32)
    grads = [rng.standard_normal((5, 4)).astype(np.float32)
             for _ in range(4)]
    lr, wd = 1e-2, 0.1

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = lion_mod.Lion([tp], lr=lr, betas=(0.9, 0.99), weight_decay=wd)
    for g in grads:
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
    ref_w = tp.detach().numpy()

    tx = optax.chain(
        optax.lion(lr, b1=0.9, b2=0.99, weight_decay=wd))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), ref_w, rtol=1e-5,
                               atol=1e-6)
