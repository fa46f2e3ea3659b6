"""Model zoo: flax linen modules, pure functions of (params, batch, rng).

Structure mirrors the reference's model/modules split (SURVEY.md §2.3-2.7):
  layers.py        attention / FFN / MLP primitives (ref modules/layers)
  posembed.py      Fourier coordinate encoding (ref mask3d/position_embedding.py)
  sparse_unet.py   Res16UNet34C-equivalent sparse U-Net (ref mask3d/res16unet.py)
  pointnet.py      PointNet++ set-abstraction encoder (ref modules/layers/pointnet.py)
  encoders.py      object/voxel/language encoders (ref modules/vision, modules/language)
  query_encoder.py unified query decoder (ref modules/grounding/query_encoder.py)
  heads.py         mask / ground / generation / cls heads (ref modules/heads)
  query3d.py       the unified model (ref model/query3d_unified.py)
"""
from pq3d_tpu.models import query3d  # noqa: F401  (registers the model)
