"""underwater_image_restoration_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
for paired underwater image restoration.

Re-designed from scratch with the capabilities of the PyTorch reference
KarthikSundar2002/Underwater-Image-Restoration (see SURVEY.md):

- model zoo: SpectralTransformer, AST, NewModel, NewBigModel, NewBigFRFNModel
  (``models.init_model(name, use_dwt=...)``)
- ~18 selectable loss functions (``losses.LossFunction``)
- UIEB paired-data pipeline with online augmentation (``data``)
- jit-compiled train step, data-parallel over a device mesh, Orbax
  checkpointing with resume (``train``)
- evaluation: PSNR / SSIM / MS-SSIM / UIQM (``evalx``)
- observability: tee logger, JSONL metric sink, optional W&B (``obs``)
- Pallas TPU kernels for the hot blocks (``ops.pallas``)

Layout convention: images are NHWC on device (TPU-native); token tensors are
(B, L, C).  The PyTorch reference is NCHW; the checkpoint converter in
``tools/convert_torch_ckpt.py`` handles the transposition.
"""

__version__ = "0.1.0"
