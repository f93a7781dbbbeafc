"""I/O: NIfTI (pure numpy), VTK legacy polydata, subject-directory walking."""

from ukbb_cardiac_tpu.io import nifti
