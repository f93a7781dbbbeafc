"""Model checkpoint store + TF-1.x checkpoint converter."""

from ukbb_cardiac_tpu.ckpt.store import load_model, save_model
