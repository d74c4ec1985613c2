"""TPU-native oriented object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the MMRotate-based
reference (goodmayonnaise/OrientedObjectDetection): rotated-box geometry,
rotated IoU/NMS kernels, the rotated detector zoo, DOTA/HRSC/SAR data
pipelines, huge-image tiling, and config-driven training/eval — designed for
TPU meshes (pjit data parallelism, static shapes, bf16 compute).
"""

__version__ = '0.1.0'
