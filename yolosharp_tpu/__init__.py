"""yolosharp_tpu — TPU-native YOLO framework (JAX/XLA/Pallas).

A ground-up re-design of IntptrMax/YoloSharp's capabilities for TPU:
functional core (params as PyTrees), jitted train/eval/predict steps,
static shapes throughout, NHWC + bf16 compute, data-parallel over a
jax.sharding.Mesh.
"""

__version__ = "0.1.0"
