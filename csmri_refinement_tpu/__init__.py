"""csmri_refinement_tpu — TPU-native CS-MRI reconstruction & refinement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mseitzer/csmri-refinement ("Adversarial and Perceptual Refinement for
Compressed Sensing MRI Reconstruction", MICCAI 2018):

* RecNet cascade reconstruction (conv blocks + k-space data consistency)
* Adversarial + perceptual refinement (frozen RecNet + U-Net residual GAN)
* Segmentation U-Net + semantic interpretability score (SIS)

Design notes (TPU-first, not a port):

* NHWC layout everywhere (XLA:TPU's preferred conv layout); the reference
  uses NCHW. Complex images are (B, H, W, 2) float arrays with channel 0 =
  real, channel 1 = imaginary.
* FFTs run on complex64 via XLA's native FFT HLO; data consistency is a pure
  jittable function with autodiff (the reference hand-writes cuFFT backward
  passes in deep_med_lib/my_pytorch/myfft.py:21-128).
* Undersampling-mask generation and the forward model run on-device with
  keyed `jax.random` (stateless; the reference generates masks in DataLoader
  workers with global numpy RNG).
* Training steps are single jitted pure functions over TrainState pytrees;
  the adversarial D-then-G update with detach semantics becomes explicit
  `stop_gradient` calls, and the GAN image pool is an on-device ring buffer
  carried in the train state.
* Multi-device scaling uses a `jax.sharding.Mesh` + NamedSharding (batch
  sharded over the `data` axis) instead of the reference's nn.DataParallel
  (utils/custom_data_parallel.py).
"""

__version__ = '0.1.0'
