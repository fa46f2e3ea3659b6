"""Host input pipeline: numpy preprocessing -> fixed-shape device batches.

Replaces the reference's torch DataLoader + wrapper + collate stack
(reference: data/build.py, data/datasets/*wrapper*.py) with a
TPU-first design: all ragged work (augmentation, voxelization, kernel-map
building, FPS query init, tokenization, padding) happens on the host, and
the device only ever sees static-shape array batches (SURVEY.md §7.1).
"""
