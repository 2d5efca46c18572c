"""season_nerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Season-NeRF framework.

A from-scratch rebuild of the capabilities of EnterpriseCV-6/Season-NeRF
(satellite-imagery NeRF with seasonal appearance, solar-aware shading, RPC
camera models, space-carving DSM priors, and a large offline evaluation
suite), redesigned for TPU hardware:

- geometry/   RPC + projective camera models, unit conversion, time & solar
              ephemeris (pure numpy on host, jnp mirrors on device).
- data/       ray-table precompute, device-resident datasets, synthetic
              scene generation for tests/benchmarks, GeoTIFF/IMD ingest.
- models/     SIREN layers, positional encodings, the T-NeRF flax module.
- ops/        stratified sampling, volume rendering, robust (Barron) loss,
              image metrics (PSNR/SSIM/EMD), Pallas kernels.
- train/      phased training engine (dual optimizers, OneCycle schedules,
              DSM-prior annealing), checkpointing, TensorBoard logging.
- priors/     space-carving plane-sweep DSM prior + height-map extraction.
- eval/       height-map / image / shadow / season evaluation suites.
- render/     whole-image / component / perspective renderers, exact-shadow
              secondary rays, keyframed movie maker.
- parallel/   mesh construction and ray-batch sharding (pjit/shard_map).
- utils/      metric writer, HSLuv, reference torch-checkpoint conversion.
- cli.py      the five reference-compatible entry points.
"""

__version__ = "0.3.0"
