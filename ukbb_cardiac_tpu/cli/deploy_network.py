"""CLI twin of ``common/deploy_network.py`` — SA/LA segmentation deploy.

Same flags (``deploy_network.py:25-40``), same outputs; the execution core
is the batched TPU engine (``infer/deploy.py``).

Usage:
  python -m ukbb_cardiac_tpu.cli.deploy_network \
      --seq_name sa --data_dir <dir> --model_path <bundle.npz>
"""

from __future__ import annotations

import argparse

from ukbb_cardiac_tpu.cli._common import add_bool_flag
from ukbb_cardiac_tpu.infer.deploy import deploy_dataset


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seq_name", choices=["sa", "la_2ch", "la_4ch"],
                        default="sa", help="Sequence name.")
    parser.add_argument("--data_dir", default="ukbb_cardiac_demo",
                        help="Path to the data set directory, under which images "
                             "are organised in subdirectories for each subject.")
    parser.add_argument("--model_path", default="",
                        help="Path to the saved trained model (.npz bundle, or "
                             "a TF checkpoint prefix to convert on the fly).")
    add_bool_flag(parser, "process_seq", True, "Process a time sequence of images.")
    add_bool_flag(parser, "save_seg", True, "Save segmentation.")
    add_bool_flag(parser, "seg4", False,
                  "Segment all the 4 chambers in long-axis 4 chamber view.")
    parser.add_argument("--chunk", type=int, default=64,
                        help="Slices per device program.")
    parser.add_argument("--trace_dir", default="",
                        help="Write a jax.profiler device trace here "
                             "(view with TensorBoard/XProf).")
    add_bool_flag(parser, "bf16", False,
                  "bf16 activations (params/BN/logits stay f32); ~0.998 "
                  "label agreement with f32 at half the HBM traffic.")
    args = parser.parse_args(argv)

    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    model_path = args.model_path
    if not model_path.endswith(".npz"):
        from ukbb_cardiac_tpu.ckpt.tf_reader import convert_tf_checkpoint
        model_path = convert_tf_checkpoint(model_path)

    compute_dtype = None
    if args.bf16:
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16

    from ukbb_cardiac_tpu.utils import device_trace
    with device_trace(args.trace_dir):
        deploy_dataset(model_path, args.data_dir, seq_name=args.seq_name,
                       process_seq=args.process_seq, save_seg=args.save_seg,
                       seg4=args.seg4, chunk=args.chunk,
                       compute_dtype=compute_dtype)


if __name__ == "__main__":
    main()
