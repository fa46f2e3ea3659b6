"""Instance-segmentation host pipeline: scene dict -> fixed-shape batch.

Performs what the reference splits across ``SceneVerseInstSeg.get_scene``,
``InstSegDatasetWrapper.collate_fn`` and MinkowskiEngine
(reference: data/datasets/sceneverse_instseg.py:120-236,
data/datasets/instseg_wrapper.py:27-81): augmentation, color normalization,
voxelization, FPS query sampling, sparse kernel-map building, and padding —
all in numpy, producing arrays the jitted model consumes without
recompilation.

Intentional deviations from the reference (documented, not accidental):
- FPS query locations are the representative points of the sampled voxels;
  the reference indexes the *full* point cloud with voxel indices
  (sceneverse_instseg.py:123), which mixes index spaces.
- Colors come from the color channels; the reference's ``pcds[:, :3:]``
  slice feeds scaled xyz into the color normalizer.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from pq3d_tpu.ops import kernel_maps, sampling, voxelize, window_maps

# hierarchy levels that get z-run fetch plans under ztriple_conv: the only
# levels whose conv shapes pass sparse.ztriple_applicable on chip
ZTRIPLE_LEVELS = (1, 2, 3)

COLOR_MEAN = np.array([0.47793125906962, 0.4303257521323044, 0.3749598901421883], np.float32)
COLOR_STD = np.array([0.2834475483823543, 0.27566157565723015, 0.27018971370874995], np.float32)


@dataclasses.dataclass
class InstSegPipelineConfig:
    voxel_size: float = 0.02
    num_queries: int = 120
    query_sample_strategy: str = "fps"      # 'fps' | 'gt'
    max_segments: int = 512
    max_instances: int = 120
    use_aug: bool = True
    fps_subsample: int = 16384   # 0 = exact FPS
    voxel_bucket: int = 4096
    # conv0 stem kernel: 5 matches the reference Res16UNet34C
    # (conv1_kernel_size, instseg_sceneverse.yaml:109); 3 is a faster
    # documented deviation (125 -> 27 gather taps on the largest level)
    conv0_kernel: int = 5
    # 'gt' collates GT segment masks as the decoder's offline attention
    # masks (ref instseg_wrapper.py:39-52, instseg_sceneverse_gt.yaml)
    offline_mask_source: Optional[str] = None
    # optional hard caps per level (static shapes across every batch)
    level_caps: Optional[Sequence[int]] = None
    # optional LADDER of cap vectors (each elementwise <= the next, last rung
    # must fit every batch): collate picks the smallest rung that fits the
    # batch's true per-level voxel counts, trading the single static shape
    # for <=len(ladder) compiled shapes with ~15-30% less padding on
    # typical batches (PERF.md "tighter voxel buckets" lever).  Overrides
    # level_caps; rectangular (non-flat_pack) layout only.
    level_cap_ladder: Optional[Sequence[Sequence[int]]] = None
    filter_out_classes: Sequence[int] = (0, 2)
    ignore_label: int = -100
    # > 0 builds Swin3D window-attention packs (regular + shifted) for
    # hierarchy levels 1-4 at this window size (ops/window_maps.py); needed
    # by the 'swin3d' voxel backbone
    swin_window: int = 0
    # flat-packed SERVING layout: per-level voxel arrays are the
    # CONCATENATION of the true (unpadded) per-scene rows — one bucketed
    # total instead of B x max(scene) padding (removes ~15-40% pad waste on
    # varied scenes).  Maps ship pre-offset with no batch dim plus
    # 'voxel_scene' / 'anc_local' / 'rect_{l}' side arrays; single-device
    # inference/training only (the dp shard-by-batch-dim rule does not
    # apply to flat arrays).
    flat_pack: bool = False
    # with flat_pack: also build tap-compacted conv plans (CSR; gathers only
    # valid (output, tap) pairs — ~2x fewer random fetches at surface
    # occupancy, ops/kernel_maps.build_compact_conv).  Trains too: the plan
    # is self-dual for symmetric stencils, so grad_mode='scatter_free'
    # selects the compact scatter-free backward (sparse_conv_compact_sym).
    compact_conv: bool = False
    # 'gather' ships the 125-tap nbr5 map for conv0; 'dense_block' instead
    # packs level-0 voxels + features into dense 8^3 blocks so conv0 runs
    # as a dense MXU conv (ops/sparse.conv0_dense_block) — no 125-tap map
    # build and no tiny-row gathers; 'none' ships neither (backbones whose
    # stem only needs nbr3_0, e.g. swin3d)
    stem_mode: str = "gather"
    stem_block: int = 8
    # fixed pad (in 8^3 blocks) for the dense-block stem pack.  Without it
    # the pack is bucketed from the batch's actual occupied-block count, so
    # stem_dense/stem_c2v/stem_nbrblk change shape across batches and force
    # recompiles even when level_caps pins every other array.  When
    # level_caps is set and this is None, a default of level_caps[0] // 16
    # is derived (real 0.02 m scans occupy ~N/30 blocks — PERF.md valid-tap
    # table — so /16 is ~2x headroom).  A batch that overflows the cap
    # falls back to the bucketed size for that batch (a recompile, never a
    # crash) with a warning.
    stem_block_cap: Optional[int] = None
    # ship z-run fetch plans (ops/kernel_maps.build_ztriple_plan) for
    # hierarchy levels 1-3: the 3^3 convs whose shapes win on chip
    # (C<=64 anywhere; C=128 at the L3 voxel count) run with 9 wide
    # gathers instead of 27 (ops/sparse.sparse_conv_ztriple; the
    # per-conv predicate is sparse.ztriple_applicable).  Levels 0 and 4
    # are skipped: their conv shapes route to the baseline/unrolled paths.
    ztriple_conv: bool = False
    # DEVICE-BUILT kernel maps (serving transfer-killer, ops/device_maps):
    # the host ships only biased voxel coords (~0.8 MB) + features; the
    # jitted forward builds the whole hierarchy (and stem pack / z-run
    # plans) ON the TPU.  Requires level_caps; rectangular layout only.
    # process_scene skips build_hierarchy entirely — the host pipeline cost
    # drops to voxelize + centers + FPS.
    device_maps: bool = False
    # flat-pack SERVING shape lock: minimum sizes for every batch-varying
    # flat dimension, so consecutive batches collate to ONE executable
    # (keys: 'tot_{l}' packed voxel totals, 'rect_{l}' rectangularization
    # width, 'win{l}s{j}_nw' swin window counts, 'stem_nb' stem blocks).
    # Build with flat_shape_caps_from(sample_batch, margin).  A batch that
    # overflows a cap falls back to its bucketed size (a recompile, never
    # a crash) — same contract as stem_block_cap.  Every flat array
    # tolerates tail padding by construction (valid=False / index -1 /
    # trash-bucket rows), so the lock only raises pad sizes.
    flat_shape_caps: Optional[Dict[str, int]] = None
    # with device_maps + flat_pack: host-side overflow check of the locked
    # caps (true per-level voxel / window counts via cheap ravel-key
    # uniques, ~tens of ms per batch).  The device builder silently drops
    # rows past a cap into trash slots, so this check is the only loud
    # signal; disable only for throughput benches on known-fitting traffic.
    device_flat_check: bool = True

    def flat_dim(self, name: str, computed: int) -> int:
        """Apply the flat shape lock to one batch-varying dimension."""
        if not self.flat_shape_caps:
            return computed
        cap = self.flat_shape_caps.get(name)
        if cap is None:
            return computed
        if computed > cap:
            import warnings
            warnings.warn(
                f"flat dim {name} overflows its shape cap ({computed} > "
                f"{cap}); falling back to the bucketed size for this batch "
                f"(one-off recompile). Raise flat_shape_caps['{name}'].",
                stacklevel=2)
            return computed
        return int(cap)

    def stem_pad_blocks(self, n_win_max: int) -> int:
        """Static block-pad for the dense stem pack (see stem_block_cap)."""
        cap = self.stem_block_cap
        if cap is None and self.level_caps:
            cap = window_maps.bucket(int(self.level_caps[0]) // 16)
        if cap is not None:
            if n_win_max <= cap:
                return cap
            import warnings
            warnings.warn(
                f"dense-block stem pack overflows stem_block_cap "
                f"({n_win_max} > {cap} occupied {self.stem_block}^3 "
                f"blocks); falling back to a bucketed pad for this batch "
                f"(one-off recompile). Raise stem_block_cap to re-pin the "
                f"shape.", stacklevel=2)
        return window_maps.bucket(n_win_max)

    def __post_init__(self):
        if self.device_maps and self.flat_pack:
            # FLAT device maps (ops/device_flat_maps): every flat dim must
            # be locked up front — the model's jitted builder bakes the
            # caps in, so there is nothing to bucket or grow against
            if self.compact_conv or self.level_cap_ladder:
                raise ValueError(
                    "device_maps + flat_pack supports neither compact_conv "
                    "nor level_cap_ladder (device shapes are compile-time)")
            if self.stem_mode not in ("none", "dense_block"):
                raise ValueError(
                    "device_maps + flat_pack needs stem_mode 'none' "
                    "(swin3d backbone) or 'dense_block' (res16unet); the "
                    "125-tap 'gather' stem has no flat device builder")
            from pq3d_tpu.ops import device_flat_maps as _dfm
            missing = _dfm.flat_caps_complete(
                self.flat_shape_caps or {}, self.swin_window, (1, 2, 3, 4),
                self.stem_mode)
            if missing:
                raise ValueError(
                    "device_maps + flat_pack needs a COMPLETE "
                    f"flat_shape_caps lock; missing {missing} — derive one "
                    "from a representative host-collated batch with "
                    "flat_shape_caps_from(batch['_meta']['flat_dims'], cfg)")
        elif self.device_maps:
            if not self.level_caps:
                raise ValueError(
                    "device_maps needs static level_caps (device shapes are "
                    "compile-time; there is nothing to bucket against)")
            if self.compact_conv or self.level_cap_ladder:
                raise ValueError(
                    "device_maps is a static-shape lever; unset "
                    "compact_conv / level_cap_ladder")
            if self.swin_window:
                raise ValueError(
                    "rectangular device_maps has no device swin-pack "
                    "builder; swin3d composes with device maps via the "
                    "FLAT layout (flat_pack=True + flat_shape_caps)")
        if self.level_cap_ladder:
            if self.flat_pack:
                raise ValueError(
                    "level_cap_ladder is a rectangular-layout lever; "
                    "collate_flat never pads to caps — unset one of "
                    "flat_pack / level_cap_ladder")
            # every rung must cover all levels: collate's fit-check zips
            # against the per-level maxima, and zip() would silently accept
            # a short rung then crash later on the missing levels
            for rung in self.level_cap_ladder:
                if len(rung) != kernel_maps.NUM_LEVELS:
                    raise ValueError(
                        f"level_cap_ladder rung {list(rung)} has "
                        f"{len(rung)} entries; expected "
                        f"{kernel_maps.NUM_LEVELS} (one per level)")
            # rungs must ascend elementwise: collate picks the FIRST rung
            # that fits, so a descending ladder silently pads everything
            # to rung 0
            for lo, hi in zip(self.level_cap_ladder,
                              self.level_cap_ladder[1:]):
                if any(a > b for a, b in zip(lo, hi)):
                    raise ValueError(
                        "level_cap_ladder rungs must be elementwise "
                        f"non-decreasing; got {list(lo)} before {list(hi)}")


def _augment(points, colors, rng: np.random.Generator):
    """Train-time augmentation matching the reference recipe
    (sceneverse_instseg.py:139-167 + configs/instseg/augmentation/*.yaml;
    every transform there sets always_apply): mean-center + random shift,
    x/y flips (p=0.5 each), then the volumentations queue — per-axis scale
    +-10%, rotation around z +-pi and tilts around y/x +-pi/24 — then the
    albumentations color queue: brightness/contrast +-0.2 and RGB shift
    +-20/255 (applied in the [0, 1] color domain; ours is [-1, 1])."""
    points = points - points.mean(0)
    points = points + rng.uniform(points.min(0), points.max(0)) / 2
    for i in (0, 1):
        if rng.random() < 0.5:
            points[:, i] = points[:, i].max() - points[:, i]
    points = points * rng.uniform(0.9, 1.1, size=3)
    for axis, lim in ((2, np.pi), (1, np.pi / 24), (0, np.pi / 24)):
        t = rng.uniform(-lim, lim)
        c, s = np.cos(t), np.sin(t)
        rot = {2: [[c, -s, 0], [s, c, 0], [0, 0, 1]],
               1: [[c, 0, s], [0, 1, 0], [-s, 0, c]],
               0: [[1, 0, 0], [0, c, -s], [0, s, c]]}[axis]
        points = points @ np.asarray(rot, np.float32).T
    x = (colors + 1) / 2
    # albumentations clips to the valid range after EVERY transform, so
    # brightness/contrast saturation must land before the RGB shift
    x = np.clip(x * (1 + rng.uniform(-0.2, 0.2)) + rng.uniform(-0.2, 0.2),
                0, 1)
    x = np.clip(x + rng.uniform(-20 / 255, 20 / 255, size=3), 0, 1)
    colors = x * 2 - 1
    return points.astype(np.float32), colors.astype(np.float32)


def _segment_centers(points, segment_id, num_segments):
    # per-axis bincount(weights=...) accumulates in f64 in the same array
    # order as np.add.at but runs ~20x faster (ufunc.at has no fast path)
    cnt = np.maximum(np.bincount(segment_id, minlength=num_segments), 1)
    sums = np.stack([np.bincount(segment_id, weights=points[:, c],
                                 minlength=num_segments) for c in range(3)],
                    axis=1)
    return (sums / cnt[:, None]).astype(np.float32)


def process_scene(scene: Dict[str, np.ndarray], cfg: InstSegPipelineConfig,
                  rng: np.random.Generator, train: bool = True
                  ) -> Dict[str, np.ndarray]:
    """One scene -> unpadded host arrays + sparse hierarchy."""
    # astype(copy=True) already yields a private buffer — no extra .copy()
    points = scene["points"].astype(np.float32)
    colors = scene["colors"].astype(np.float32)
    segment_id = scene["segment_id"]
    inst_point = scene["instance_labels"]
    inst_labels = scene["inst_labels"]

    if train and cfg.use_aug:
        points, colors = _augment(points, colors, rng)

    # normalize color ((x+1)/2 maps [-1,1] -> [0,1] like the /255 path)
    color_n = ((colors + 1) / 2 - COLOR_MEAN) / COLOR_STD

    n_seg = int(segment_id.max()) + 1
    seg_center = _segment_centers(points, segment_id, n_seg)
    seg_sizes = np.bincount(segment_id, minlength=n_seg).astype(np.float32)

    n_inst = len(inst_labels)
    obj_center = np.zeros((n_inst, 3), np.float32)
    segment_masks = np.zeros((n_inst, n_seg), bool)
    own = (inst_point >= 0) & (inst_point < n_inst)
    if own.any():
        ip = inst_point[own]
        cnt = np.bincount(ip, minlength=n_inst).astype(np.float32)
        nz = cnt > 0
        for c in range(3):
            sums = np.bincount(ip, weights=points[own, c], minlength=n_inst)
            obj_center[nz, c] = (sums[nz] / cnt[nz]).astype(np.float32)
        pair = ip.astype(np.int64) * n_seg + segment_id[own]
        up = np.unique(pair)
        segment_masks[up // n_seg, up % n_seg] = True

    # voxelize
    vox_coords, unique_map, inverse_map = voxelize.quantize(points, cfg.voxel_size)
    voxel_feats = color_n[unique_map]
    voxel2segment = segment_id[unique_map].astype(np.int32)

    # queries (approximate FPS on a candidate subset, like the reference's
    # bucket-kd fpsample)
    if cfg.query_sample_strategy == "fps":
        fps_idx = sampling.fps_numpy(vox_coords.astype(np.float32),
                                     cfg.num_queries,
                                     subsample=cfg.fps_subsample, rng=rng)
        query_locs = points[unique_map][fps_idx]
        query_valid = np.ones(cfg.num_queries, bool)
    elif cfg.query_sample_strategy == "gt":
        query_locs = obj_center
        query_valid = np.ones(len(obj_center), bool)
    else:
        raise NotImplementedError(cfg.query_sample_strategy)

    # nbr5 (the 125-tap conv0 map, ~32 MB padded) is built later in collate
    # DIRECTLY into the batch buffer — skipping a per-scene alloc + a stack
    # copy, the measured host-pipeline hot spot
    # ladder mode pads per-scene naturally; the batch rung is picked in
    # collate (which only copies true rows, so any rung >= true count works)
    hierarchy = None
    if not cfg.device_maps:
        use_caps = cfg.level_caps and not cfg.level_cap_ladder
        hierarchy = kernel_maps.build_hierarchy(
            vox_coords,
            pad_sizes=list(cfg.level_caps) if use_caps else None,
            bucket=cfg.voxel_bucket, build_nbr5=False)

    swin_packs = None
    if cfg.swin_window and not cfg.device_maps:
        swin_packs = window_maps.build_swin_packs(
            [hierarchy.coords[l][:hierarchy.num_voxels[l]]
             for l in range(len(hierarchy.coords))],
            cfg.swin_window, levels=(1, 2, 3, 4))

    full_instance_masks = None
    if not train:
        full_instance_masks = np.stack(
            [inst_point == i for i in range(n_inst)]) if n_inst else \
            np.zeros((0, len(points)), bool)

    return {
        "points": points,
        "vox_coords": vox_coords,
        "voxel_feats": voxel_feats,
        "voxel2segment": voxel2segment,
        "voxel_to_full": inverse_map.astype(np.int32),
        "segment_to_full": segment_id.astype(np.int32),
        "full_instance_masks": full_instance_masks,
        "scan_id": scene.get("scan_id", ""),
        "hierarchy": hierarchy,
        "seg_center": seg_center,
        "seg_sizes": seg_sizes,
        "obj_center": obj_center,
        "query_locs": query_locs.astype(np.float32),
        "query_valid": query_valid,
        "coord_min": points.min(0),
        "coord_max": points.max(0),
        "instance_labels": inst_labels.astype(np.int32),
        "segment_masks": segment_masks,
        "swin_packs": swin_packs,
    }


def collate(scenes: List[Dict[str, np.ndarray]], cfg: InstSegPipelineConfig,
            include_voxel: bool = True) -> Dict[str, np.ndarray]:
    """Stack processed scenes into one fixed-shape batch.

    Per-level pad sizes must agree across the batch: we re-pad every scene's
    hierarchy to the per-level max (bucketed), then stack.

    ``include_voxel=False`` skips the per-level hierarchy maps and voxel
    arrays (collate_flat supplies its own flat versions — building the
    rectangular ones just to overwrite them doubled the flat host cost).
    """
    b = len(scenes)
    n_levels = kernel_maps.NUM_LEVELS
    dev_maps = cfg.device_maps and include_voxel
    if not include_voxel:
        pad = [0] * n_levels
    elif dev_maps:
        # device-built maps: the only host-shipped voxel arrays are the
        # biased coords + features; pads come straight from level_caps
        # (static by contract — __post_init__ enforces they exist)
        pad = list(cfg.level_caps)
    elif cfg.level_cap_ladder:
        true_max = [max(s["hierarchy"].num_voxels[l] for s in scenes)
                    for l in range(n_levels)]
        for rung in cfg.level_cap_ladder:
            if all(t <= r for t, r in zip(true_max, rung)):
                pad = [int(r) for r in rung]
                break
        else:
            raise ValueError(
                f"no level_cap_ladder rung fits batch voxel counts "
                f"{true_max}; largest rung {list(cfg.level_cap_ladder[-1])}")
    elif cfg.level_caps:
        # normally the configured caps verbatim (one compiled shape); a
        # scene that overflowed a cap was bucket-padded by build_hierarchy
        # (see kernel_maps.build_hierarchy fallback) — follow its pad so
        # the batch buffers fit (a recompile for this batch, not a crash)
        pad = [max(int(c), max(s["hierarchy"].pad_sizes[l] for s in scenes))
               for l, c in enumerate(cfg.level_caps)]
    else:
        pad = [max(s["hierarchy"].pad_sizes[l] for s in scenes)
               for l in range(n_levels)]
    S, M, Q = cfg.max_segments, cfg.max_instances, cfg.num_queries

    # hierarchy maps: preallocate the (B, ...) batch arrays at fill value and
    # write each scene's true rows directly — the old repad-then-stack path
    # copied every map twice (measured host hot spot after the native
    # neighbor builds)
    maps: Dict[str, np.ndarray] = {}
    if dev_maps:
        vox_coords = np.zeros((b, pad[0], 3), np.int32)
        n_voxels = np.zeros((b,), np.int32)
    elif include_voxel:
        for l in range(n_levels):
            maps[f"valid_{l}"] = np.zeros((b, pad[l]), bool)
            maps[f"nbr3_{l}"] = np.full((b, pad[l], 27), -1, np.int32)
        for l in range(n_levels - 1):
            maps[f"child_{l}"] = np.full((b, pad[l + 1], 8), -1, np.int32)
            maps[f"parent_{l}"] = np.full((b, pad[l]), -1, np.int32)
            maps[f"parent_off_{l}"] = np.zeros((b, pad[l]), np.int32)
        maps["ancestor"] = np.zeros((b, n_levels, pad[0]), np.int32)

    batch: Dict[str, List[np.ndarray]] = {k: [] for k in ([
        "voxel_feats", "voxel2segment"] if include_voxel else []) + [
        "seg_center", "seg_pad_masks",
        "segment_sizes", "query_locs", "query_pad_masks", "coord_min",
        "coord_max", "instance_labels", "segment_masks", "instance_valid",
        "obj_center", "obj_pad_masks",
    ]}

    for i, s in enumerate(scenes):
        if dev_maps:
            from pq3d_tpu.ops import device_maps as _dm
            vc = s["vox_coords"]
            n0 = len(vc)
            if n0 > pad[0]:
                import warnings
                warnings.warn(
                    f"scene has {n0} voxels > level cap {pad[0]}; truncating "
                    f"for the device-maps batch (raise level_caps[0])")
                vc, n0 = vc[:pad[0]], pad[0]
            if cfg.stem_mode == "dense_block":
                # the device stem pack drops blocks past its static cap —
                # a cheap host count catches the overflow LOUDLY instead
                # (device code cannot warn from inside jit)
                blk = cfg.stem_block
                wc = (vc >> 3) if blk == 8 else (vc // blk)
                dims = wc.max(0) - wc.min(0) + 1
                wz = wc - wc.min(0)
                nw = len(np.unique(
                    (wz[:, 0].astype(np.int64) * dims[1] + wz[:, 1])
                    * dims[2] + wz[:, 2]))
                # mirror ops/device_maps.build_batch_maps's static default —
                # the device cap cannot grow per batch like stem_pad_blocks
                cap_nw = cfg.stem_block_cap or window_maps.bucket(
                    int(cfg.level_caps[0]) // 16)
                if nw > cap_nw:
                    import warnings
                    warnings.warn(
                        f"scene occupies {nw} {blk}^3 blocks > device stem "
                        f"cap {cap_nw}; overflowing blocks will be DROPPED "
                        f"on device (raise stem_block_cap)")
            biased, _base = _dm.bias_coords_16(vc)
            vox_coords[i, :n0] = biased
            n_voxels[i] = n0
            batch["voxel_feats"].append(
                kernel_maps.pad_rows(s["voxel_feats"][:pad[0]], pad[0]))
            v2s = kernel_maps.pad_rows(s["voxel2segment"][:pad[0]],
                                       pad[0], S)
            v2s[n0:] = S  # trash bucket
            batch["voxel2segment"].append(np.minimum(v2s, S))
        elif include_voxel:
            h: kernel_maps.SparseHierarchy = s["hierarchy"]
            nv = [min(n, p) for n, p in zip(h.num_voxels, pad)]
            for l in range(n_levels):
                maps[f"valid_{l}"][i, :nv[l]] = h.valid[l][:nv[l]]
                maps[f"nbr3_{l}"][i, :nv[l]] = h.nbr3[l][:nv[l]]
            for l in range(n_levels - 1):
                maps[f"child_{l}"][i, :nv[l + 1]] = h.child[l][:nv[l + 1]]
                maps[f"parent_{l}"][i, :nv[l]] = h.parent[l][:nv[l]]
                maps[f"parent_off_{l}"][i, :nv[l]] = h.parent_off[l][:nv[l]]
            maps["ancestor"][i, :, :nv[0]] = h.ancestor[:, :nv[0]]
            n0 = h.num_voxels[0]
            batch["voxel_feats"].append(
                kernel_maps.pad_rows(s["voxel_feats"], pad[0]))
            v2s = kernel_maps.pad_rows(s["voxel2segment"], pad[0], S)
            v2s[n0:] = S  # trash bucket
            batch["voxel2segment"].append(np.minimum(v2s, S))
        ns = len(s["seg_center"])
        batch["seg_center"].append(kernel_maps.pad_rows(s["seg_center"][:S], S))
        batch["seg_pad_masks"].append(
            kernel_maps.pad_rows(np.ones(min(ns, S), bool), S, False))
        batch["segment_sizes"].append(
            kernel_maps.pad_rows(s["seg_sizes"][:S], S, 0.0))
        nq = len(s["query_locs"])
        batch["query_locs"].append(kernel_maps.pad_rows(s["query_locs"][:Q], Q))
        qv = kernel_maps.pad_rows(s["query_valid"][:Q], Q, False)
        batch["query_pad_masks"].append(qv)
        batch["coord_min"].append(s["coord_min"])
        batch["coord_max"].append(s["coord_max"])
        m = len(s["instance_labels"])
        batch["instance_labels"].append(
            kernel_maps.pad_rows(s["instance_labels"][:M], M, 0))
        sm = s["segment_masks"][:M, :S]
        sm = np.pad(sm, ((0, M - sm.shape[0]), (0, S - sm.shape[1])))
        batch["segment_masks"].append(sm)
        batch["instance_valid"].append(
            kernel_maps.pad_rows(np.ones(min(m, M), bool), M, False))
        no = len(s["obj_center"])
        batch["obj_center"].append(kernel_maps.pad_rows(s["obj_center"][:M], M))
        batch["obj_pad_masks"].append(
            kernel_maps.pad_rows(np.ones(min(no, M), bool), M, False))

    out = {k: np.stack(v) for k, v in batch.items()}
    out["maps"] = maps
    if dev_maps:
        out["vox_coords"] = vox_coords
        out["n_voxels"] = n_voxels
    if cfg.swin_window and not dev_maps:
        w = cfg.swin_window
        for l in (1, 2, 3, 4):
            for j in (0, 1):
                key = f"win{l}s{j}"
                n_win_pad = window_maps.bucket(
                    max(s["swin_packs"][f"{key}_nwin"] for s in scenes))
                padded = [window_maps.pad_pack(
                    {"cell_to_vox": s["swin_packs"][f"{key}_c2v"],
                     "vox_slot": s["swin_packs"][f"{key}_slot"],
                     "n_win": s["swin_packs"][f"{key}_nwin"]},
                    w, n_win_pad, pad[l]) for s in scenes]
                out["maps"][f"{key}_c2v"] = np.stack(
                    [p["cell_to_vox"] for p in padded])
                out["maps"][f"{key}_slot"] = np.stack(
                    [p["vox_slot"] for p in padded])
    # conv0 5^3 map: one preallocated (B, P0, 125) buffer, each scene's map
    # written in place by the native builder (no stack copy)
    if cfg.offline_mask_source == "gt":
        # (B, Q, S) True = attend: in GT-query mode query i is instance i
        # and attends exactly its segments (ref instseg_wrapper.py:40-44,
        # inverted — our masks are attend-semantics)
        oam = np.zeros((b, Q, S), bool)
        for i, s in enumerate(scenes):
            sm = s["segment_masks"][:Q, :S]
            oam[i, :sm.shape[0], :sm.shape[1]] = sm
        out["offline_attn_mask"] = oam
    if include_voxel and cfg.ztriple_conv and not dev_maps:
        for l in ZTRIPLE_LEVELS:
            base, codes = kernel_maps.build_ztriple_plan(
                maps[f"nbr3_{l}"].reshape(-1, 27), n_pad=pad[l])
            maps[f"zt{l}_base"] = base.reshape(b, pad[l], 9)
            maps[f"zt{l}_code"] = codes.reshape(b, pad[l], 9, 3)
    if dev_maps:
        pass    # stem packs / nbr5 / zt plans are built on device
    elif cfg.stem_mode == "dense_block":
        blk = cfg.stem_block
        b3 = blk ** 3
        packs = [window_maps.build_window_pack(
            s["vox_coords"], blk, 0, with_neighbors=True) for s in scenes]
        nb_pad = cfg.stem_pad_blocks(max(p["n_win"] for p in packs))
        cin = scenes[0]["voxel_feats"].shape[1]
        dense = np.zeros((b, nb_pad * b3, cin), np.float32)
        c2v = np.full((b, nb_pad * b3), -1, np.int32)
        slot = np.full((b, pad[0]), -1, np.int32)
        nbrblk = np.full((b, nb_pad, 27), -1, np.int32)
        for i, (s, p) in enumerate(zip(scenes, packs)):
            dense[i, p["vox_slot"]] = s["voxel_feats"]
            c2v[i, :len(p["cell_to_vox"])] = p["cell_to_vox"]
            slot[i, :len(p["vox_slot"])] = p["vox_slot"]
            nbrblk[i, :p["n_win"]] = p["nbr_win"]
        out["maps"]["stem_dense"] = dense.reshape(b, nb_pad, b3 * cin)
        out["maps"]["stem_c2v"] = c2v
        out["maps"]["stem_slot"] = slot
        out["maps"]["stem_nbrblk"] = nbrblk
    elif cfg.stem_mode == "gather":
        k5 = len(kernel_maps.kernel_offsets(cfg.conv0_kernel))
        nbr5 = np.empty((b, pad[0], k5), np.int32)
        for i, s in enumerate(scenes):
            kernel_maps.build_neighbor_map(s["vox_coords"], cfg.conv0_kernel,
                                           n_pad=pad[0], out=nbr5[i])
        out["maps"]["nbr5_0"] = nbr5
    # host-only eval side channel: full-resolution reconstruction maps
    # (ref instseg_wrapper.py:55 list-collated voxel_to_full/segment_to_full)
    out["_meta"] = {
        "segment_to_full": [s["segment_to_full"] for s in scenes],
        "full_instance_masks": [s.get("full_instance_masks")
                                for s in scenes],
        "points": [s["points"] for s in scenes],
        "scan_id": [s.get("scan_id", "") for s in scenes],
    }
    return out


def collate_flat(scenes: List[Dict[str, np.ndarray]],
                 cfg: InstSegPipelineConfig) -> Dict[str, np.ndarray]:
    """Flat-packed variant of :func:`collate` (cfg.flat_pack): voxel-level
    arrays concatenate true per-scene rows; everything segment/instance/
    query-level stays rectangular (B, ...) so the decoder, losses and
    evaluators are untouched."""
    b = len(scenes)
    n_levels = kernel_maps.NUM_LEVELS
    hs = [s["hierarchy"] for s in scenes]
    counts = [[h.num_voxels[l] for h in hs] for l in range(n_levels)]
    starts = [np.concatenate([[0], np.cumsum(c)]).astype(np.int64)
              for c in counts]
    flat_dims: Dict[str, int] = {}

    def _dim(name: str, computed: int) -> int:
        # record the TRUE (pre-lock) size so a serving auto-lock can be
        # derived / grown from actual traffic, then apply the lock
        flat_dims[name] = int(computed)
        return cfg.flat_dim(name, computed)

    tot = [_dim(f"tot_{l}", window_maps.bucket(int(starts[l][-1]),
                                               cfg.voxel_bucket))
           for l in range(n_levels)]

    maps: Dict[str, np.ndarray] = {}
    for l in range(n_levels):
        valid = np.zeros(tot[l], bool)
        valid[:starts[l][-1]] = True
        nbr = np.full((tot[l], 27), -1, np.int32)
        for i, h in enumerate(hs):
            n = counts[l][i]
            sl = slice(starts[l][i], starts[l][i] + n)
            src = h.nbr3[l][:n]
            nbr[sl] = np.where(src >= 0, src + starts[l][i], -1)
        maps[f"valid_{l}"] = valid
        maps[f"nbr3_{l}"] = nbr
    for l in range(n_levels - 1):
        child = np.full((tot[l + 1], 8), -1, np.int32)
        parent = np.full(tot[l], -1, np.int32)
        poff = np.zeros(tot[l], np.int32)
        for i, h in enumerate(hs):
            nf, nc = counts[l][i], counts[l + 1][i]
            cs = h.child[l][:nc]
            child[starts[l + 1][i]:starts[l + 1][i] + nc] = np.where(
                cs >= 0, cs + starts[l][i], -1)
            ps = h.parent[l][:nf]
            parent[starts[l][i]:starts[l][i] + nf] = np.where(
                ps >= 0, ps + starts[l + 1][i], -1)
            poff[starts[l][i]:starts[l][i] + nf] = h.parent_off[l][:nf]
        maps[f"child_{l}"] = child
        maps[f"parent_{l}"] = parent
        maps[f"parent_off_{l}"] = poff
    # flat + scene-local ancestors, scene ids, rectangularization gathers
    anc = np.zeros((n_levels, tot[0]), np.int32)
    anc_local = np.zeros((n_levels, tot[0]), np.int32)
    scene_id = np.zeros(tot[0], np.int32)
    for i, h in enumerate(hs):
        n0 = counts[0][i]
        sl = slice(starts[0][i], starts[0][i] + n0)
        scene_id[sl] = i
        for l in range(n_levels):
            a = h.ancestor[l, :n0]
            anc[l, sl] = a + starts[l][i]
            anc_local[l, sl] = a
    maps["ancestor"] = anc
    maps["anc_local"] = anc_local
    maps["voxel_scene"] = scene_id
    for l in range(n_levels):
        pmax = _dim(f"rect_{l}",
                    window_maps.bucket(max(counts[l]) if counts[l] else 1))
        rect = np.full((b, pmax), -1, np.int32)
        for i in range(b):
            rect[i, :counts[l][i]] = np.arange(
                starts[l][i], starts[l][i] + counts[l][i], dtype=np.int32)
        maps[f"rect_{l}"] = rect

    if cfg.swin_window:
        # flat swin packs: per-scene window packs concatenated, window cells
        # offset by the running window count, voxel ids by the level starts
        # (mirrors the dense-block stem packing below)
        w3 = cfg.swin_window ** 3
        for l in (1, 2, 3, 4):
            for j in (0, 1):
                key = f"win{l}s{j}"
                nwin = [int(s["swin_packs"][f"{key}_nwin"]) for s in scenes]
                wstart = np.concatenate([[0], np.cumsum(nwin)]).astype(
                    np.int64)
                nw_tot = _dim(f"{key}_nw",
                              window_maps.bucket(int(wstart[-1])))
                c2v = np.full(nw_tot * w3, -1, np.int32)
                slot = np.full(tot[l], -1, np.int32)
                for i, s in enumerate(scenes):
                    sc = s["swin_packs"][f"{key}_c2v"]
                    cell0 = wstart[i] * w3
                    c2v[cell0:cell0 + len(sc)] = np.where(
                        sc >= 0, sc + starts[l][i], -1)
                    ss = s["swin_packs"][f"{key}_slot"]
                    slot[starts[l][i]:starts[l][i] + counts[l][i]] = \
                        ss + cell0
                maps[f"{key}_c2v"] = c2v
                maps[f"{key}_slot"] = slot

    if cfg.stem_mode == "dense_block":
        blk = cfg.stem_block
        b3 = blk ** 3
        packs = [window_maps.build_window_pack(
            s["vox_coords"], blk, 0, with_neighbors=True) for s in scenes]
        nwin = [p["n_win"] for p in packs]
        wstart = np.concatenate([[0], np.cumsum(nwin)]).astype(np.int64)
        nb_tot = _dim("stem_nb", window_maps.bucket(int(wstart[-1])))
        cin = scenes[0]["voxel_feats"].shape[1]
        dense = np.zeros((nb_tot * b3, cin), np.float32)
        c2v = np.full(nb_tot * b3, -1, np.int32)
        slot = np.full(tot[0], -1, np.int32)
        nbrblk = np.full((nb_tot, 27), -1, np.int32)
        for i, (sc, pk) in enumerate(zip(scenes, packs)):
            cell0 = wstart[i] * b3
            dense[cell0 + pk["vox_slot"]] = sc["voxel_feats"]
            cv = pk["cell_to_vox"]
            c2v[cell0:cell0 + len(cv)] = np.where(
                cv >= 0, cv + starts[0][i], -1)
            slot[starts[0][i]:starts[0][i] + counts[0][i]] = \
                pk["vox_slot"] + cell0
            nb = pk["nbr_win"]
            nbrblk[wstart[i]:wstart[i] + nwin[i]] = np.where(
                nb >= 0, nb + wstart[i], -1)
        maps["stem_dense"] = dense.reshape(nb_tot, b3 * cin)
        maps["stem_c2v"] = c2v
        maps["stem_slot"] = slot
        maps["stem_nbrblk"] = nbrblk
    elif cfg.stem_mode == "gather":
        nbr5 = np.full((tot[0], len(kernel_maps.kernel_offsets(
            cfg.conv0_kernel))), -1, np.int32)
        for i, s in enumerate(scenes):
            n0 = counts[0][i]
            m = kernel_maps.build_neighbor_map(s["vox_coords"],
                                               cfg.conv0_kernel)
            nbr5[starts[0][i]:starts[0][i] + n0] = np.where(
                m >= 0, m + starts[0][i], -1)
        maps["nbr5_0"] = nbr5

    S = cfg.max_segments
    vf = np.zeros((tot[0], scenes[0]["voxel_feats"].shape[1]), np.float32)
    v2s = np.full(tot[0], S, np.int32)
    for i, s in enumerate(scenes):
        n0 = counts[0][i]
        sl = slice(starts[0][i], starts[0][i] + n0)
        vf[sl] = s["voxel_feats"]
        v2s[sl] = np.minimum(s["voxel2segment"], S)

    if cfg.ztriple_conv:
        for l in ZTRIPLE_LEVELS:
            zb, zc = kernel_maps.build_ztriple_plan(maps[f"nbr3_{l}"],
                                                    n_pad=tot[l])
            maps[f"zt{l}_base"] = zb
            maps[f"zt{l}_code"] = zc

    if cfg.compact_conv:
        for l in range(n_levels):
            plan = kernel_maps.build_compact_conv(maps[f"nbr3_{l}"])
            maps[f"cmp{l}_in"] = plan["in_idx"]
            maps[f"cmp{l}_out"] = plan["out_idx"]
            maps[f"cmp{l}_sa"] = plan["slots_a"]
            maps[f"cmp{l}_sb"] = plan["slots_b"]
            maps[f"cmp{l}_src"] = plan["src"]

    # rectangular (B, ...) segment/query/instance keys via the standard
    # collate, skipping its voxel-level maps/arrays entirely (the flat ones
    # below replace them; building both doubled the flat host cost)
    out = collate(scenes, dataclasses.replace(cfg, flat_pack=False,
                                              swin_window=0,
                                              level_cap_ladder=None,
                                              stem_mode="none"),
                  include_voxel=False)
    out["maps"] = maps
    out["voxel_feats"] = vf
    out["voxel2segment"] = v2s
    out["_meta"]["flat_dims"] = flat_dims
    return out


def collate_flat_device(scenes: List[Dict[str, np.ndarray]],
                        cfg: InstSegPipelineConfig
                        ) -> Dict[str, np.ndarray]:
    """Flat layout with DEVICE-built maps (ops/device_flat_maps): the host
    ships only the concatenated biased voxel coords + per-scene counts +
    flat features; the jitted forward builds every flat index array on
    the accelerator.  Host cost drops to voxelize + concat (no hierarchy,
    no window packs, no neighbor maps), and the shipped bytes drop from
    60-100 MB of int32 maps to ~0.5 MB of coords.

    Requires a COMPLETE ``cfg.flat_shape_caps`` lock (enforced by
    ``__post_init__``); a batch that overflows a locked cap warns loudly
    here — on device the overflow rows are silently dropped into trash
    slots, so the warning is the only signal.
    """
    from pq3d_tpu.ops import device_maps as _dm
    caps = cfg.flat_shape_caps
    b = len(scenes)
    tot0 = int(caps["tot_0"])
    counts = np.array([len(s["vox_coords"]) for s in scenes], np.int32)
    total0 = int(counts.sum())
    if total0 > tot0:
        raise ValueError(
            f"batch has {total0} voxels > flat_shape_caps['tot_0'] {tot0}; "
            "device flat shapes cannot grow — raise the lock (and rebuild "
            "the model with matching voxel_enc.device_flat_caps)")
    align = _dm.swin_bias_align(cfg.swin_window)
    cin = scenes[0]["voxel_feats"].shape[1]
    feat_dt = scenes[0]["voxel_feats"].dtype
    vox_coords = np.zeros((tot0, 3), np.int32)
    voxel_feats = np.zeros((tot0, cin), feat_dt)
    v2s = np.full(tot0, cfg.max_segments, np.int32)
    r = 0
    for s in scenes:
        n = len(s["vox_coords"])
        biased, _base = _dm.bias_coords_16(s["vox_coords"], align=align)
        vox_coords[r:r + n] = biased
        voxel_feats[r:r + n] = s["voxel_feats"]
        v2s[r:r + n] = np.minimum(s["voxel2segment"], cfg.max_segments)
        r += n
    # uint32 key-space guard (ops/device_flat_maps module docstring):
    # B * dx*dy*dz must stay clear of the wrap region
    dims = vox_coords[:total0].max(0).astype(np.int64) + 3 \
        if total0 else np.array([3, 3, 3], np.int64)
    vol = int(dims[0] * dims[1] * dims[2])
    if (b + 1) * vol >= 2 ** 32:
        raise ValueError(
            f"scene-augmented uint32 key space overflow: {b} scenes x "
            f"field volume {vol} — split the batch or coarsen voxel_size")

    true_dims = {"tot_0": total0, "rect_0": int(counts.max())}
    if cfg.device_flat_check:
        true_dims = _flat_device_true_dims(
            [vox_coords[s:s + n] for s, n in
             zip(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)],
            cfg)
        over = {k: (v, caps[k]) for k, v in true_dims.items()
                if v > caps.get(k, 1 << 30)}
        if over:
            raise ValueError(
                f"batch overflows the device flat shape lock: "
                f"{{name: (true, cap)}} = {over} — the device builder "
                "would silently DROP rows; raise flat_shape_caps (and "
                "rebuild the model with matching device_flat_caps) or "
                "split the batch")

    out = collate(scenes, dataclasses.replace(cfg, flat_pack=False,
                                              device_maps=False,
                                              swin_window=0,
                                              level_cap_ladder=None,
                                              stem_mode="none"),
                  include_voxel=False)
    out["maps"] = {}        # built on device (same contract as rect dev)
    out["vox_coords"] = vox_coords
    out["n_voxels"] = counts
    out["voxel_feats"] = voxel_feats
    out["voxel2segment"] = v2s
    out["_meta"]["flat_dims"] = true_dims
    return out


def _flat_device_true_dims(scene_coords: List[np.ndarray],
                           cfg: InstSegPipelineConfig) -> Dict[str, int]:
    """True flat dims of a batch from its (biased) per-scene coords alone —
    the host-side overflow check for the device flat builder.  One int64
    ravel-key ``np.unique`` per (scene, level[, window shift]); no
    neighbor maps, no packs."""
    def _keys(c: np.ndarray) -> np.ndarray:
        if not len(c):
            return np.zeros(0, np.int64)
        d = c.max(0).astype(np.int64) + 1
        return (c[:, 0].astype(np.int64) * d[1] + c[:, 1]) * d[2] + c[:, 2]

    dims: Dict[str, int] = {}
    lvl = [np.asarray(c, np.int64) for c in scene_coords]
    for l in range(kernel_maps.NUM_LEVELS):
        dims[f"tot_{l}"] = sum(len(c) for c in lvl)
        dims[f"rect_{l}"] = max((len(c) for c in lvl), default=1)
        if cfg.swin_window and l in (1, 2, 3, 4):
            w = cfg.swin_window
            for j, sh in enumerate((0, w // 2)):
                dims[f"win{l}s{j}_nw"] = sum(
                    len(np.unique(_keys((c + sh) // w))) for c in lvl)
        if l == 0 and cfg.stem_mode == "dense_block":
            dims["stem_nb"] = sum(
                len(np.unique(_keys(c // cfg.stem_block))) for c in lvl)
        if l < kernel_maps.NUM_LEVELS - 1:
            nxt = []
            for c in lvl:
                k = np.unique(_keys(c >> 1))
                d = (c >> 1).max(0).astype(np.int64) + 1 \
                    if len(c) else np.ones(3, np.int64)
                nxt.append(np.stack([k // (d[1] * d[2]),
                                     (k // d[2]) % d[1],
                                     k % d[2]], axis=1))
            lvl = nxt
    return dims


def flat_shape_caps_from(dims: Dict[str, int],
                         cfg: InstSegPipelineConfig,
                         margin: float = 1.3) -> Dict[str, int]:
    """Derive a ``flat_shape_caps`` lock from one batch's TRUE flat dims
    (``batch['_meta']['flat_dims']``), scaled by ``margin`` and re-bucketed.
    Serving recipe: collate one representative batch, lock the caps,
    rebuild the pipe config — every subsequent batch that fits compiles to
    the SAME executable (InstSegServer does this automatically)."""
    return {name: window_maps.bucket(
                int(n * margin),
                cfg.voxel_bucket if name.startswith("tot_") else 256)
            for name, n in dims.items()}


def collate_processed(processed: List[Dict[str, np.ndarray]],
                      cfg: InstSegPipelineConfig) -> Dict[str, np.ndarray]:
    """Single dispatch point for layout selection — every consumer of
    pre-processed scenes (training loaders, serving, benches) must batch
    through here so layout branches stay in one place."""
    if cfg.flat_pack:
        if cfg.device_maps:
            return collate_flat_device(processed, cfg)
        return collate_flat(processed, cfg)
    return collate(processed, cfg)


def make_batch(scenes: List[Dict[str, np.ndarray]], cfg: InstSegPipelineConfig,
               rng: np.random.Generator, train: bool = True
               ) -> Dict[str, np.ndarray]:
    processed = [process_scene(s, cfg, rng, train) for s in scenes]
    return collate_processed(processed, cfg)
