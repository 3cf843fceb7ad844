"""Worked example: a custom fused bias+GELU Pallas kernel, validated against
the XLA reference and dispatched through the framework's kernel-flag system.

Reference analog: examples/openai_triton/ (a user Triton kernel wrapped as a
TRT plugin + custom functional op). Here the 'plugin' is just a function.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, b_ref, o_ref):
    # fp32 math, tanh-free exact GELU via the A-S erf polynomial (Mosaic
    # has no erf lowering; ops/pallas/fused_decoder_step.py documents this)
    x = x_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    a = jnp.abs(x) * jnp.float32(2.0 ** -0.5)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.where(x < 0, -(1.0 - poly * jnp.exp(-a * a)),
                    1.0 - poly * jnp.exp(-a * a))
    o_ref[...] = (0.5 * x * (1.0 + erf)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bias_gelu(x, bias, interpret=False):
    """x (B, D) + bias (D,) -> gelu(x + bias), one fused kernel. Rows tile
    over the grid; D rides the lanes."""
    b, d = x.shape
    block = min(b, 256)
    assert b % block == 0
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0)),
        interpret=interpret,
    )(x, bias[None])


def main():
    # inside the framework you'd gate on ops.pallas.pallas_enabled() (the
    # PluginConfig-flag analog); standalone, the backend check is enough
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512, 384)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((384,)).astype(np.float32))

    out = fused_bias_gelu(x, bias, interpret=interpret)
    ref = jax.nn.gelu(x + bias, approximate=False)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"backend={jax.default_backend()} interpret={interpret} "
          f"max|err| vs XLA = {err:.2e}")
    assert err < 1e-5
    print("custom kernel matches the XLA reference")


if __name__ == "__main__":
    main()
