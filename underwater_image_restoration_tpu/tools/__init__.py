"""Offline conversion tools (run where torch/torchvision are available):

- ``convert_vgg16``     — torchvision VGG16 -> vgg16_features.npz for the
  perceptual losses (losses/perceptual.py).
- ``convert_checkpoint`` — reference PyTorch ``.pth`` checkpoints
  (ModelTrainer.py:176-181 payloads) -> this framework's flax params, so
  trained reference models run unchanged on TPU.
"""
