"""Kernel substrate: host-side preprocessing + device (XLA/Pallas) kernels.

TPU-native replacements for the reference's CUDA / MinkowskiEngine /
torch_scatter native ops (reference: modules/third_party/pointnet2/_ext_src,
MinkowskiEngine external dep; see SURVEY.md §2.8):

host (numpy, in the input pipeline — keeps jitted graphs static-shape):
  - voxelize:    coordinate quantization + hashing (ref: data/voxelize.py)
  - kernel_maps: sparse-conv neighbor maps / coordinate hierarchies
                 (replaces MinkowskiEngine coordinate manager)
  - sampling.fps_numpy: FPS for query initialization (ref: fpsample dep)

device (JAX/XLA/Pallas):
  - sparse.sparse_conv:        gather->GEMM sparse convolution
  - segment.segment_mean:      voxel->segment pooling (ref: torch_scatter)
  - sampling.{furthest_point_sample, ball_query, group_points, three_nn,
    three_interpolate}:        PointNet++ ops (ref: pointnet2 CUDA kernels)
  - hungarian.solve:           linear sum assignment (ref: scipy on CPU)
  - pairwise.calc_pairwise_locs: spatial relation features
"""
