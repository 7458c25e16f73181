"""gstex_tpu — TPU-native per-primitive textured 2D Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of GStex
(arXiv 2409.12954). See DESIGN.md for architecture and SURVEY.md for the
reference inventory this covers.
"""

__version__ = "0.1.0"
