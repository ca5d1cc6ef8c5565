"""pangu-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the Pangu-Weather
global forecast framework, matching the capabilities of the PyTorch
reference (zhaoshan2/pangu-pytorch) with an idiomatic TPU-first design."""

__version__ = "0.1.0"
