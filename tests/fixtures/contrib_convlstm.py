"""Test fixture: ``tf.contrib.rnn.Conv2DLSTMCell`` re-created over tf.compat.v1.

The reference's aortic UNet-LSTM (``common/network_ao.py:225-253,277-300``)
builds its recurrent head with ``tf.contrib.rnn.Conv2DLSTMCell``, whose
variables — ``conv_2d_lstm_cell/{kernel,biases}`` under the enclosing
``LSTM[/forward|/backward]`` scopes — define the released-checkpoint naming
contract for ``UNet-LSTM_ao``.  ``tf.contrib`` no longer exists (TF >= 2),
so parity tests cannot import the real cell; this fixture reconstructs it
behaviourally over raw ``tf.compat.v1`` ops so that **TensorFlow's own
variable-scope machinery generates every name** (the ``variable_scope(None,
default_name=...)`` uniquifier — the same mechanism ``base_layer.Layer``
used for the contrib cell), with nothing hand-pinned.

Behavioural contract reproduced (contrib ``ConvLSTMCell``, TF 1.x
``tensorflow/contrib/rnn/python/ops/rnn_cell.py``):
- one SAME conv over ``concat([inputs, hidden], -1)`` with kernel shape
  ``kernel_shape + [in_depth + C, 4 * C]`` named ``kernel``, plus a
  zero-initialised ``biases`` vector of ``4 * C``;
- gate split order (input i, new-input j, forget f, output o) along the
  channel axis;
- ``c' = sigmoid(f + forget_bias) * c + sigmoid(i) * tanh(j)`` with the
  default ``forget_bias = 1.0``; ``h' = tanh(c') * sigmoid(o)``;
- state is the ``(c, h)`` tuple; ``zero_state`` is all-zeros of shape
  ``[batch] + spatial + [output_channels]``.

This is a clean-room re-implementation from the cell's documented
behaviour (mirrored in ``ukbb_cardiac_tpu/models/convlstm.py``); it
contains no TensorFlow source code.
"""

from __future__ import annotations


class Conv2DLSTMCell:
    """Drop-in for ``tf.contrib.rnn.Conv2DLSTMCell`` in parity-test graphs.

    Scope behaviour matches the TF-1.x Layer contract: the first call
    enters ``variable_scope(None, default_name=name)`` — TF's own
    per-enclosing-scope uniquifier — and captures the resulting scope;
    later calls re-enter the captured scope with ``reuse=True`` (the
    reference sets ``reuse_variables()`` on the outer scope before every
    ``t > 0`` call, ``network_ao.py:230-236,285-287``).
    """

    def __init__(self, input_shape, output_channels, kernel_shape,
                 forget_bias=1.0, name="conv_2d_lstm_cell"):
        import tensorflow.compat.v1 as tf1

        self._tf1 = tf1
        self._input_shape = list(input_shape)      # [X, Y, C_in]
        self._output_channels = int(output_channels)
        self._kernel_shape = list(kernel_shape)    # [kh, kw]
        self._forget_bias = float(forget_bias)
        self._name = name
        self._scope = None

    def zero_state(self, batch_size, dtype):
        tf1 = self._tf1
        spatial = self._input_shape[:-1]
        shape = [batch_size] + spatial + [self._output_channels]
        zeros = tf1.zeros(tf1.stack(shape), dtype=dtype)
        return (zeros, zeros)

    def __call__(self, inputs, state):
        tf1 = self._tf1
        cell, hidden = state
        if self._scope is None:
            ctx = tf1.variable_scope(None, default_name=self._name)
        else:
            ctx = tf1.variable_scope(self._scope, reuse=True)
        with ctx as scope:
            self._scope = scope
            in_depth = int(inputs.shape[-1]) + self._output_channels
            kernel = tf1.get_variable(
                "kernel",
                self._kernel_shape + [in_depth, 4 * self._output_channels],
                initializer=tf1.random_normal_initializer(stddev=0.1))
            xh = tf1.concat([inputs, hidden], axis=-1)
            gates = tf1.nn.conv2d(xh, kernel, strides=[1, 1, 1, 1],
                                  padding="SAME")
            biases = tf1.get_variable(
                "biases", [4 * self._output_channels],
                initializer=tf1.constant_initializer(0.0))
            gates = tf1.nn.bias_add(gates, biases)
            i, j, f, o = tf1.split(gates, 4, axis=3)
            new_cell = (tf1.sigmoid(f + self._forget_bias) * cell
                        + tf1.sigmoid(i) * tf1.tanh(j))
            output = tf1.tanh(new_cell) * tf1.sigmoid(o)
        return output, (new_cell, output)
