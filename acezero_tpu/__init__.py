"""acezero-tpu: TPU-native scene-coordinate reconstruction (ACE0 capabilities).

A from-scratch JAX/XLA/Pallas framework with the capabilities of
nianticlabs/acezero (reference mounted at /root/reference): camera pose
reconstruction of unordered image collections without feature matching, by
alternating incremental training of a scene-coordinate regressor with batched
RANSAC/PnP registration of all frames — the whole loop resident on a TPU mesh.

Layer map (bottom-up):
  geometry/      pure-JAX SE(3), quaternions, projection, Kabsch
  io/            ACE pose-file format (byte compatible), PLY, transforms.json
  data/          host decode + on-device image pipeline and augmentation
  models/        encoder / scene head / pose-refiner MLP as param pytrees
  ops/           Pallas TPU kernels for the hot paths
  training/      device-resident patch buffer, fused train step, schedules
  registration/  vectorized RANSAC + P3P + LM registrar (replaces DSAC* C++)
  parallel/      mesh & sharding helpers
  reconstruct/   the ACE0 outer loop, in process
  evalpose/      pose-accuracy metrics (5cm/5deg after similarity alignment)
  export/        point clouds, camera meshes, nerfstudio transforms
"""

__version__ = "0.1.0"
