"""CLI entry points mirroring the reference's scripts.

Run as ``python -m ukbb_cardiac_tpu.cli.<name> [flags]``:

  deploy_network          (common/deploy_network.py)
  deploy_network_ao       (common/deploy_network_ao.py)
  train_network           (common/train_network.py)
  train_network_ao        (common/train_network_ao.py)
  eval_ventricular_volume (short_axis/eval_ventricular_volume.py)
  eval_wall_thickness     (short_axis/eval_wall_thickness.py)
  eval_strain_sax         (short_axis/eval_strain_sax.py)
  eval_atrial_volume      (long_axis/eval_atrial_volume.py)
  eval_strain_lax         (long_axis/eval_strain_lax.py)
  eval_aortic_area        (aortic/eval_aortic_area.py)
  demo_pipeline           (demo_pipeline.py)
"""
