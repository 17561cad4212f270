"""Shared harness for driving the reference's ACTUAL TensorFlow code in-env.

Used by test_tf_golden (full-forward numerics) and test_lockstep_train
(training-dynamics lockstep). Stubs the two absent third-party deps before
importing the reference package from /root/reference:

  * ``box.Box``: dict-with-attribute-access (the reference only does
    Box(vars(namespace)) and attribute reads);
  * ``tensorflow_addons``: InstanceNormalization(center=False, scale=False,
    epsilon=1e-5) is affine-free instance norm (raft_extractor.py:95-116),
    and tfa.image.resampler's documented semantics (bilinear, OOB -> 0) are
    provided by the reference's own pure-TF drop-in
    uflow/uflow_resampler.py:56-74.

Also provides ``TfaAdamW``: the reference trains with
``tfa.optimizers.AdamW(weight_decay=schedule, learning_rate=schedule,
epsilon=1e-8, clipnorm=1.0)`` (train.py:170-175); tfa is not installed, so
this reproduces its documented update rule on top of the in-env Keras Adam:
decoupled decay ``var -= wd_t * var`` applied before the Adam update and NOT
scaled by the learning rate (tfa DecoupledWeightDecayExtension._decay_weights_op;
the in-env Keras AdamW multiplies wd by lr, which is a ~1/lr-factor semantic
difference the reference's recipes compensate for by passing
``weight_decay * learning_rate`` schedules).
"""
import sys
import types

import tensorflow as tf


def install_stubs():
    """Stub box + tensorflow_addons, then make the reference importable."""
    if "box" not in sys.modules:
        box_mod = types.ModuleType("box")

        class Box(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        box_mod.Box = Box
        sys.modules["box"] = box_mod

    keras = tf.keras
    if "tensorflow_addons" not in sys.modules:
        tfa = types.ModuleType("tensorflow_addons")
        tfa_layers = types.ModuleType("tensorflow_addons.layers")
        tfa_image = types.ModuleType("tensorflow_addons.image")

        class InstanceNormalization(keras.layers.Layer):
            """tfa.layers.InstanceNormalization(center=False, scale=False):
            per-sample per-channel normalization over H, W; no parameters
            (raft_extractor.py:95-116 passes epsilon=1e-5)."""

            def __init__(self, axis=3, epsilon=1e-5, center=False, scale=False,
                         **kwargs):
                kwargs.pop("beta_initializer", None)
                kwargs.pop("gamma_initializer", None)
                super().__init__()
                assert not center and not scale, "affine-free stand-in only"
                self.epsilon = epsilon

            def call(self, x):
                mean, var = tf.nn.moments(x, axes=[1, 2], keepdims=True)
                return (x - mean) * tf.math.rsqrt(var + self.epsilon)

        class GroupNormalization(keras.layers.Layer):  # pragma: no cover
            def __init__(self, *a, **k):
                raise NotImplementedError(
                    "GroupNormalization is only reached by norm_fn='group', "
                    "which the standard RAFT never selects"
                )

        tfa_layers.InstanceNormalization = InstanceNormalization
        tfa_layers.GroupNormalization = GroupNormalization

        sys.path.insert(0, "/root/reference")
        from uflow import uflow_resampler  # the reference's pure-TF resampler

        tfa_image.resampler = uflow_resampler.resampler
        tfa.layers = tfa_layers
        tfa.image = tfa_image
        sys.modules["tensorflow_addons"] = tfa
        sys.modules["tensorflow_addons.layers"] = tfa_layers
        sys.modules["tensorflow_addons.image"] = tfa_image
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


class TfaAdamW(tf.keras.optimizers.Adam):
    """tfa.optimizers.AdamW semantics on the in-env Keras Adam.

    ``var -= wd_t * var`` per trainable variable (every variable — tfa decays
    norm scales and biases too unless exclude lists are passed, and the
    reference passes none), applied immediately before the Adam update whose
    gradients are per-variable clipnorm'd (train.py:174 clipnorm=1.0). The
    decay is independent of Adam's moments, so decay-before-update composes
    to ``var_new = var - wd*var - lr*adam(g)`` exactly as tfa's
    control-dependency ordering does.
    """

    def __init__(self, weight_decay, **kwargs):
        super().__init__(**kwargs)
        self._tfa_wd = weight_decay

    def apply_gradients(self, grads_and_vars, *args, **kwargs):
        gv = [(g, v) for g, v in grads_and_vars]
        wd = self._tfa_wd
        wd_t = wd(self.iterations) if callable(wd) else wd
        for _, v in gv:
            v.assign_sub(tf.cast(wd_t, v.dtype) * v)
        return super().apply_gradients(gv, *args, **kwargs)
