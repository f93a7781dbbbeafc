"""TF-1.x checkpoint → native model bundle converter.

The reference ships five trained TF checkpoints (``FCN_sa``,
``FCN_la_2ch``, ``FCN_la_4ch``, ``FCN_la_4ch_seg4``, ``UNet-LSTM_ao``,
``demo_pipeline.py:50-54``) whose graph contract is tensors
``image:0 / training:0 / prob:0 / pred:0`` (``deploy_network.py:48-49``).
This module reads the checkpoint *values* (via TensorFlow's checkpoint
reader — no graph import needed), reconstructs the architecture config
from the variable shapes, maps every tensor onto this framework's
parameter pytrees (whose keys replicate ``tf.layers`` auto-naming by
construction, see ``models/layers.py``) and writes a native bundle.

Kernel-layout conversions applied:
- conv2d / conv2d_3d kernels: TF HWIO == ours, copied as-is.
- conv2d_transpose kernels: TF stores HW-out-in and applies them flipped;
  ours are correlation HWIO, so flip both spatial axes and swap the two
  channel axes once here (see ``layers.conv2d_transpose``).
- ConvLSTM cell kernels/biases: identical layout, gate order (i, j, f, o)
  and forget bias 1.0 match ``models/convlstm.py``.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from ukbb_cardiac_tpu.ckpt import store


def load_tf_variables(prefix: str) -> Dict[str, np.ndarray]:
    """Read all variables of a TF checkpoint (needs tensorflow on host)."""
    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(prefix)
    except ImportError as e:  # pragma: no cover - env without TF
        raise ImportError(
            "Converting TF checkpoints requires tensorflow on the host; "
            "deploy-time inference does not.") from e
    names = reader.get_variable_to_shape_map().keys()
    return {name: np.asarray(reader.get_tensor(name)) for name in names
            if not name.startswith("beta1_power")
            and not name.startswith("beta2_power")
            and "/Adam" not in name}


def _flip_transpose_kernel(k: np.ndarray) -> np.ndarray:
    """TF conv2d_transpose (H, W, out, in) → our correlation HWIO."""
    return np.ascontiguousarray(k[::-1, ::-1].transpose(0, 1, 3, 2))


def _fill_from_tf(tree, tf_vars: Dict[str, np.ndarray], prefix: str = ""):
    """Replace every leaf of our pytree with the same-named TF tensor."""
    import jax.numpy as jnp

    out = {}
    for key, val in tree.items():
        path = f"{prefix}{key}"
        if isinstance(val, dict):
            out[key] = _fill_from_tf(val, tf_vars, path + "/")
        else:
            if path not in tf_vars:
                raise KeyError(f"checkpoint missing variable {path}")
            t = tf_vars[path]
            if "conv2d_transpose" in path.rsplit("/", 2)[-2] and \
                    path.endswith("kernel") and t.ndim == 4:
                t = _flip_transpose_kernel(t)
            if tuple(t.shape) != tuple(np.shape(val)):
                raise ValueError(f"{path}: shape {t.shape} != {np.shape(val)}")
            out[key] = jnp.asarray(t)
    return out


def _infer_fcn_config(tf_vars: Dict[str, np.ndarray]):
    """Reconstruct FCNConfig from tf.layers-named variable shapes."""
    from ukbb_cardiac_tpu.models.fcn import FCNConfig

    conv_names = sorted(
        (n for n in tf_vars if re.fullmatch(r"conv2d(_\d+)?/kernel", n)),
        key=lambda n: int((re.search(r"_(\d+)/", n) or [0, 0])[1] or 0))
    kshapes = [tf_vars[n].shape for n in conv_names]
    # encoder = leading 3x3 convs; group by output channels
    n_block = []
    n_filter = []
    i = 0
    while i < len(kshapes) and kshapes[i][0] == 3:
        ch = kshapes[i][3]
        cnt = 0
        while i < len(kshapes) and kshapes[i][0] == 3 and kshapes[i][3] == ch:
            cnt += 1
            i += 1
        n_filter.append(int(ch))
        n_block.append(cnt)
    n_level = len(n_filter)
    same_dim = int(kshapes[i][3])       # first 1x1 projection
    fc = int(kshapes[i + n_level][3])   # first fc conv after n_level projections
    n_class = int(kshapes[-1][3])
    return FCNConfig(n_class=n_class, n_level=n_level, n_filter=tuple(n_filter),
                     n_block=tuple(n_block), same_dim=same_dim, fc=fc)


def _infer_unet_config(tf_vars: Dict[str, np.ndarray]):
    from ukbb_cardiac_tpu.models.unet import UNetConfig

    levels = sorted({int(m.group(1)) for n in tf_vars
                     if (m := re.match(r"UNet/conv(\d+)/", n))})
    n_level = max(levels) + 1
    n_filter, n_block = [], []
    for l in range(n_level):
        convs = [n for n in tf_vars
                 if re.fullmatch(rf"UNet/conv{l}/conv2d(_\d+)?/kernel", n)]
        n_block.append(len(convs))
        n_filter.append(int(tf_vars[sorted(convs)[0]].shape[3]))
    out_bias = tf_vars.get("UNet/conv_out/conv2d/bias")
    if out_bias is None:
        out_bias = tf_vars["LSTM/output/conv2d/bias"]
    return UNetConfig(n_class=int(out_bias.shape[0]), n_level=n_level,
                      n_filter=tuple(n_filter), n_block=tuple(n_block))


def convert_tf_checkpoint(prefix: str, out_path: Optional[str] = None) -> str:
    """Convert a reference TF checkpoint into a native bundle; returns the
    bundle path."""
    import jax

    tf_vars = load_tf_variables(prefix)
    out_path = out_path or prefix.replace(".ckpt", "") + ".npz"

    if any(n.startswith("UNet/") for n in tf_vars):
        from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod

        cfg = _infer_unet_config(tf_vars)
        params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        has_lstm = any(n.startswith("LSTM/") for n in tf_vars)
        conv_out_init = None
        if has_lstm:
            bidir = any(n.startswith("LSTM/forward/") for n in tf_vars)
            lstm_kernel = (tf_vars["LSTM/forward/conv_2d_lstm_cell/kernel"]
                           if bidir else tf_vars["LSTM/conv_2d_lstm_cell/kernel"])
            n_hidden = int(lstm_kernel.shape[-1]) // 4
            init = convlstm.init_biconv_lstm if bidir else convlstm.init_conv_lstm
            params.update(init(jax.random.PRNGKey(1), cfg.n_filter[0], n_hidden,
                               cfg.n_class))
            # the standalone UNet head conv may be absent in the LSTM ckpt;
            # keep its random init (unused by the LSTM inference path) and
            # fall through to the shared fill/save tail below
            if "UNet/conv_out/conv2d/kernel" not in tf_vars:
                conv_out_init = params["UNet"].pop("conv_out")
        params = _fill_from_tf(params, tf_vars)
        if conv_out_init is not None:
            params["UNet"]["conv_out"] = conv_out_init
        state = _fill_from_tf(state, tf_vars)
        kind = "unet_lstm" if has_lstm else "unet"
        extra = {"source_checkpoint": prefix}
        if has_lstm:
            extra["bidirectional"] = bidir
        store.save_model(out_path, kind, cfg, names, params, state, extra)
        return out_path

    from ukbb_cardiac_tpu.models import fcn as fcn_mod

    cfg = _infer_fcn_config(tf_vars)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    params = _fill_from_tf(params, tf_vars)
    state = _fill_from_tf(state, tf_vars)
    store.save_model(out_path, "fcn", cfg, names, params, state,
                     {"source_checkpoint": prefix})
    return out_path
