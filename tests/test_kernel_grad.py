"""ops/kernel_grad.py: kernel-forward / reference-backward wrapper.

The TPU dispatch itself (ln_qkv + cosine_mha/small_n/geglu_ff primals in the
training step) is certified on-chip by scripts/ab_train_kernel_fwd.py parity;
these tests pin the wrapper's autodiff semantics and the env gate on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.ops.kernel_grad import (kernel_fwd_ref_bwd,
                                               train_kernel_fwd_ops)


def test_primal_is_kernel_grad_is_ref():
    # kernel and ref differ measurably so each path is attributable
    def kernel(x, w):
        return (x @ w) * 1.001  # "fast kernel" with a bf16-style delta

    def ref(x, w):
        return x @ w

    f = kernel_fwd_ref_bwd(kernel, ref)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(8, 8), jnp.float32)

    np.testing.assert_allclose(f(x, w), kernel(x, w), rtol=1e-6)

    def loss(x, w):
        return jnp.sum(f(x, w) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    # the vjp is d(ref)/d(x,w) evaluated with the PRIMAL cotangent
    # g = 2 * kernel(x, w):  remat semantics, not kernel autodiff
    ct = 2.0 * kernel(x, w)
    np.testing.assert_allclose(gx, ct @ w.T, rtol=1e-5)
    np.testing.assert_allclose(gw, x.T @ ct, rtol=1e-5)


def test_wrapper_composes_under_jit_and_has_no_kernel_grad_path():
    calls = []

    def kernel(x):
        calls.append("kernel")
        return x * 2.0

    def ref(x):
        calls.append("ref")
        return x + x

    f = kernel_fwd_ref_bwd(kernel, ref)
    g = jax.jit(jax.grad(lambda x: jnp.sum(f(x))))(jnp.ones((3,)))
    np.testing.assert_allclose(g, 2.0 * np.ones(3), rtol=1e-6)
    assert "kernel" in calls and "ref" in calls


@pytest.mark.parametrize("raw,expect", [
    ("", set()),
    ("0", set()),
    ("1", {"attn", "ff", "flat"}),
    ("attn, ff", {"attn", "ff"}),
    ("flat", {"flat"}),
])
def test_env_gate(monkeypatch, raw, expect):
    monkeypatch.setenv("OMNITOK_TRAIN_KERNEL_FWD", raw)
    assert set(train_kernel_fwd_ops()) == expect
