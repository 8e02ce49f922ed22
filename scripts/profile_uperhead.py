"""UPerHead component costs at ADE20K shapes: which of laterals / fpn convs
/ bottleneck / resizes dominates the ~12 ms/4-crop head?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_util import device_time

B, C = 4, 768


def main():
    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(k, (B, 128, 128, C), jnp.float32)
    f4 = jax.random.normal(k, (B, 16, 16, C), jnp.float32)
    w3_big = jax.random.normal(k, (3, 3, 4 * C, C), jnp.bfloat16) * 0.02
    w3 = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(k, (1, 1, C, C), jnp.bfloat16) * 0.02

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    cat = jnp.concatenate([f1] * 4, axis=-1)
    t_bottleneck = device_time(jax.jit(lambda x: conv(x, w3_big)), cat)
    t_fpn128 = device_time(jax.jit(lambda x: conv(x, w3)), f1)
    t_lat128 = device_time(jax.jit(lambda x: conv(x, w1)), f1)
    t_resize = device_time(jax.jit(lambda x: jax.image.resize(
        x, (B, 128, 128, C), method="bilinear")), f4)
    t_gn = device_time(jax.jit(lambda x: jax.nn.relu(
        (x - x.mean(-1, keepdims=True)))), f1)

    flops_b = 2 * B * 128 * 128 * 4 * C * C * 9
    flops_f = 2 * B * 128 * 128 * C * C * 9
    print(f"fpn_bottleneck 3x3 3072->768 @128^2: {t_bottleneck*1e3:7.3f} ms"
          f"  ({flops_b/t_bottleneck/1e12:.0f} TFLOPS)")
    print(f"fpn conv 3x3 768->768 @128^2      : {t_fpn128*1e3:7.3f} ms"
          f"  ({flops_f/t_fpn128/1e12:.0f} TFLOPS)")
    print(f"lateral 1x1 768->768 @128^2       : {t_lat128*1e3:7.3f} ms")
    print(f"bilinear resize 16^2 -> 128^2     : {t_resize*1e3:7.3f} ms")
    print(f"elementwise norm-ish @128^2       : {t_gn*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
