import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.models.classifier import (
    estimator_label,
    estimator_label_lehe,
    estimator_to_model_index_16,
    model_index_oracle,
)
from detectinblur_tpu.models.ensemble import stack_params, select_params
from detectinblur_tpu.ops.normalization import get_norm_params, CANONICAL_STD


def test_estimator_label_16():
    blurring = jnp.array([True, True, False, True])
    param = jnp.array([0, 2, -1, 1])
    frac = jnp.array([0, 4, -1, -1])
    labels = np.asarray(estimator_label(blurring, param, frac))
    # param*5 + frac + 1; clean and negligible-exposure -> 0.
    np.testing.assert_array_equal(labels, [1, 15, 0, 0])


def test_estimator_label_lehe():
    blurring = jnp.array([True, True, True, False])
    param = jnp.array([0, 1, 2, -1])
    frac = jnp.array([2, 3, 4, -1])
    labels = np.asarray(estimator_label_lehe(blurring, param, frac))
    # Low exposure (frac<3) -> 0; else param+1.
    np.testing.assert_array_equal(labels, [0, 2, 3, 0])


def test_estimator_to_model_index():
    preds = jnp.arange(16)
    idx = np.asarray(estimator_to_model_index_16(preds))
    np.testing.assert_array_equal(idx[0], 0)
    np.testing.assert_array_equal(idx[1:6], 1)
    np.testing.assert_array_equal(idx[6:11], 2)
    np.testing.assert_array_equal(idx[11:16], 3)


def test_oracle_dispatch():
    blurring = jnp.array([False, True, True, True])
    param = jnp.array([-1, 0, 2, 1])
    frac = jnp.array([-1, 2, 4, -1])
    idx = np.asarray(model_index_oracle(blurring, param, frac))
    # engine.py:171-192: fraction -1 -> model 0; else param+1.
    np.testing.assert_array_equal(idx, [0, 1, 3, 0])


def test_stack_select_params():
    trees = [{"a": jnp.full((2, 2), float(i)), "b": {"c": jnp.full(3, float(i))}}
             for i in range(4)]
    stacked = stack_params(trees)
    assert stacked["a"].shape == (4, 2, 2)
    sel = select_params(stacked, jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(sel["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(sel["b"]["c"]), 2.0)


def test_norm_params_lookup():
    blurring = jnp.array([True, True, False, True])
    param = jnp.array([0, 2, -1, 1])
    frac = jnp.array([0, 4, -1, -1])
    means, stds = get_norm_params(blurring, param, frac)
    m, s = np.asarray(means), np.asarray(stds)
    np.testing.assert_allclose(m, np.tile([0.485, 0.456, 0.406], (4, 1)), atol=1e-6)
    # Clean & negligible-exposure rows use canonical stds.
    np.testing.assert_allclose(s[2], CANONICAL_STD, atol=1e-6)
    np.testing.assert_allclose(s[3], CANONICAL_STD, atol=1e-6)
    # Blurred rows use table column fraction_index+1, rescaled by .229/.2384.
    np.testing.assert_allclose(s[0], np.array([0.2337, 0.2288, 0.2325]) * 0.229 / 0.2384,
                               atol=1e-6)
    np.testing.assert_allclose(s[1], np.array([0.1824, 0.1790, 0.1838]) * 0.229 / 0.2384,
                               atol=1e-6)
