"""tmae_tpu: TPU-native (JAX/XLA/Pallas) framework with the capabilities of T-MAE
(ECCV 2024): self-supervised temporal MAE pretraining + CenterPoint-style 3D detection
on LiDAR point clouds. See DESIGN.md for the TPU mapping of each reference component.
"""

__version__ = '0.1.0'
