"""HumanoidVision-TPU: a TPU-native (JAX/XLA/Pallas/pjit) perception framework.

A from-scratch rebuild of the capabilities of ``nazimurahman/humanoid-vision-system``
(hybrid CNN+ViT detector with Manifold-Constrained Hyper-Connections), designed
TPU-first: NHWC convs, fused log-domain Sinkhorn inside the forward pass, on-device
decode+NMS, bf16 activations / fp32 params, and ``jax.sharding`` meshes for scale-out.

Layout (mirrors the reference's layer map, SURVEY.md §1):
    ops/         constraint math (Sinkhorn, manifold projectors), boxes, NMS, Pallas kernels
    models/      mHC layers, backbone, ViT, FPN, YOLO head, RAG, top-level HybridVisionSystem
    parallel/    device meshes, sharding rules, data-parallel plumbing
    training/    losses, optax optimizers/schedules, trainer, stability monitor
    data/        datasets, COCO adapter, transforms, loaders, camera streaming
    inference/   engine, preprocessing, postprocessing, visualizer, robot interface
    deployment/  REST/gRPC servers, export, health checks
    utils/       logging, metrics (detection + stability), profiler
    config/      typed dataclass configs + YAML load/merge
"""

__version__ = "0.1.0"
