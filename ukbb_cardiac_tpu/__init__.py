"""ukbb_cardiac_tpu — a TPU-native cardiac MR analysis framework.

A from-scratch JAX/XLA rebuild of the capabilities of
``baiwenjia/ukbb_cardiac`` (reference mounted at /root/reference):

* NIfTI cine ingestion and on-device image preprocessing (``io``, ``ops``)
* Fully-convolutional segmentation model zoo — FCN, ResNet-FCN, U-Net,
  Temporal U-Net, (Bi)ConvLSTM — in JAX (``models``)
* A batched, jitted deployment engine that pushes every (slice, frame) of a
  cine through the network in one device program (``infer``)
* Training with optax, on-device augmentation and resumable native
  checkpoints (``train``, ``ckpt``)
* B-spline free-form-deformation registration on TPU replacing MIRTK
  (``reg``)
* Clinical phenotypes: ventricular/atrial volumes, AHA-17 wall thickness,
  aortic areas, strain (``phenotype``)
* Phenome-wide association analysis (``assoc``)
* UK Biobank DICOM→NIfTI data preparation (``data``)
* SPMD utilities over a ``jax.sharding.Mesh`` (``parallel``)
"""

__version__ = "0.1.0"
