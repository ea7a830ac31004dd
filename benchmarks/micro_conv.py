"""Micro-benchmark: conv covariance gram + per-sample-gradient paths on
CIFAR/ResNet-9 shapes.

Usage: python scratch_conv_bench.py [batch]
Per layer shape, times (a) im2col gram, (b) symmetric shifted-window gram,
(c) im2col per-sample gradients, (d) vmapped conv-backprop-filter psg.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kronfluence_tpu.capture.specs import LayerSpec
from kronfluence_tpu.ops.covariance import (
    conv_activation_gram,
    conv_per_sample_gradient,
    gram,
    per_sample_gradient,
)
from kronfluence_tpu.ops.flatten import (
    activation_tokens_with_bias,
    flatten_activation,
    gradient_tokens,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = 10
print(f"backend={jax.default_backend()} batch={B}", file=sys.stderr)

# ResNet-9 interior layer shapes (H, W, C_in, C_out) after each pool stage.
LAYERS = [
    (32, 32, 64, 128),
    (16, 16, 128, 128),
    (16, 16, 128, 256),
    (8, 8, 256, 512),
    (4, 4, 512, 512),
]

rng = np.random.default_rng(0)


def timed(fn, *args):
    @jax.jit
    def run(*a):
        out = None
        for _ in range(REPS):
            r = fn(*a)
            r = jax.tree_util.tree_leaves(r)[0]
            out = r if out is None else out + r
        return out

    out = run(*args)
    float(jnp.sum(out.astype(jnp.float32)[:1, :1]))
    t0 = time.time()
    out = run(*args)
    float(jnp.sum(out.astype(jnp.float32)[:1, :1]))
    return (time.time() - t0) / REPS


for (h, w, cin, cout) in LAYERS:
    spec = LayerSpec(
        name="c", kind="conv2d", has_bias=False, in_dim=cin * 9, out_dim=cout,
        kernel_size=(3, 3), strides=(1, 1), padding="SAME",
        kernel_dilation=(1, 1), feature_group_count=1,
    )
    x = jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((B, h, w, cout)), jnp.bfloat16)
    float(jnp.sum(x.astype(jnp.float32)[:1, :1, 0, 0]))

    def im2col_gram(x):
        flat, _ = flatten_activation(spec, x, None, None, jnp.bfloat16)
        return gram(flat, jnp.float32)

    def sym_gram(x):
        return conv_activation_gram(spec, x, None, jnp.bfloat16, jnp.float32)[0]

    def im2col_psg(x, dy):
        a_tok = activation_tokens_with_bias(spec, x, jnp.bfloat16)
        g_tok = gradient_tokens(spec, dy, None, jnp.bfloat16)
        return per_sample_gradient(a_tok, g_tok, jnp.float32)

    def direct_psg(x, dy):
        return conv_per_sample_gradient(spec, x, dy, None, jnp.float32)

    t_ig = timed(im2col_gram, x)
    t_sg = timed(sym_gram, x)
    t_ip = timed(im2col_psg, x, dy)
    t_dp = timed(direct_psg, x, dy)
    print(
        f"{h}x{w}x{cin}->{cout}: gram im2col {t_ig*1e3:7.2f} ms | sym "
        f"{t_sg*1e3:7.2f} ms ({t_ig/t_sg:4.2f}x) || psg im2col "
        f"{t_ip*1e3:7.2f} ms | direct {t_dp*1e3:7.2f} ms ({t_ip/t_dp:4.2f}x)",
        file=sys.stderr,
    )
