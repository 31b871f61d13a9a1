"""nerfnav_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the nerf-navigation stack.

Capability parity target: stein7/nerf-navigation (torch-ngp Instant-NGP core +
differential-flatness quadrotor planner + 6-DoF optimization pose filter +
Blender-in-the-loop simulator). See SURVEY.md at the repo root for the layer map.

Package layout:
  ops/        encoder / marching / compositing compute ops (pure-XLA + Pallas)
  models/     field networks + volume renderer + occupancy grid state
  data/       dataset provider (transforms.json), ray generation
  training/   Trainer (optax/orbax), metrics, EMA
  nav/        planner, estimator, agent, dynamics, SO(3)/SE(3) math
  parallel/   device-mesh sharding helpers (pjit/shard_map)
  cli/        main_nerf / simulate entry points
"""

__version__ = "0.1.0"
