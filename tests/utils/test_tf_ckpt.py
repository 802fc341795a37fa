"""Pure-Python TF tensor-bundle reader vs tensorflow's own writer/reader."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from pytorch_models_tpu.utils.tf_ckpt import load_tf_checkpoint  # noqa: E402


def _write_ckpt(tmp_path, tensors):
    prefix = str(tmp_path / "model.ckpt")
    with tf.compat.v1.Graph().as_default():
        variables = [tf.compat.v1.get_variable(name, initializer=tf.constant(val))
                     for name, val in tensors.items()]
        saver = tf.compat.v1.train.Saver(variables, max_to_keep=1)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False)
    return prefix


def test_tf_bundle_reader_parity(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        # MaxViT-style EMA names with deep slash paths (ref maxvit.py:213-218)
        "maxvit/stem/conv_0/kernel/ExponentialMovingAverage": rng.standard_normal((3, 3, 3, 64)).astype(np.float32),
        "maxvit/stem/norm_0/gamma/ExponentialMovingAverage": rng.standard_normal((64,)).astype(np.float32),
        "maxvit/block_00_00/attention/relative_bias/ExponentialMovingAverage":
            rng.standard_normal((2, 169)).astype(np.float32),
        "plain_var": rng.standard_normal((7, 5)).astype(np.float32),
        "int_var": rng.integers(-5, 5, (4,)).astype(np.int64),
        "scalar": np.float32(3.25),
        # large enough to span multiple table blocks when combined
        "big": rng.standard_normal((256, 257)).astype(np.float32),
    }
    prefix = _write_ckpt(tmp_path, tensors)

    oracle = tf.train.load_checkpoint(prefix)
    ours = load_tf_checkpoint(prefix)

    oracle_map = oracle.get_variable_to_shape_map()
    ours_map = ours.get_variable_to_shape_map()
    for name in tensors:
        assert ours_map[name] == oracle_map[name], name
        np.testing.assert_array_equal(ours.get_tensor(name), np.asarray(oracle.get_tensor(name)), err_msg=name)
    ours.close()


def test_tf_bundle_reader_many_vars(tmp_path):
    """Hundreds of variables force multi-block index tables (prefix compression
    + restart points across block boundaries)."""
    rng = np.random.default_rng(1)
    tensors = {
        f"maxvit/block_{i:02d}_{j:02d}/layer/kernel/ExponentialMovingAverage":
            rng.standard_normal((4, 4)).astype(np.float32)
        for i in range(12) for j in range(12)
    }
    prefix = _write_ckpt(tmp_path, tensors)
    ours = load_tf_checkpoint(prefix)
    assert set(ours.get_variable_to_shape_map()) == set(tensors)
    for name, val in tensors.items():
        np.testing.assert_array_equal(ours.get_tensor(name), val, err_msg=name)
    ours.close()


def test_maxvit_loader_with_pure_reader(tmp_path):
    """End-to-end: write a synthetic MaxViT TF checkpoint through tensorflow,
    load it with OUR reader through the real converter, and compare against
    loading the same variables directly (FakeTFReader path)."""
    from pytorch_models_tpu.models.image.maxvit import MaxViT
    from tests.image.test_maxvit import TINY, FakeTFReader, _make_tf_vars
    from tests.oracle import rng

    tensors = _make_tf_vars(rng(7), **TINY)
    prefix = _write_ckpt(tmp_path, tensors)

    ours = MaxViT(**TINY)
    reader = load_tf_checkpoint(prefix)
    ours.load_google_state_dict(reader)
    reader.close()

    direct = MaxViT(**TINY)
    direct.load_google_state_dict(FakeTFReader(tensors))

    x = np.asarray(rng(8).standard_normal((1, 3, 56, 56)), np.float32)
    np.testing.assert_allclose(np.asarray(ours(x)), np.asarray(direct(x)), rtol=1e-6, atol=1e-6)
