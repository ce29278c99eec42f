"""Cost-analysis / timing utilities (counterpart of the reference's analytic
``flops()`` methods, ``swinTransformer.py:171-182`` etc.)."""

import jax.numpy as jnp
import numpy as np

from mumpy_tpu.utils.profiling import StepTimer, cost_analysis


def test_cost_analysis_matmul_flops():
    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    cost = cost_analysis(lambda x, y: x @ y, a, b)
    # 2*M*N*K FLOPs for a matmul
    assert abs(cost.get("flops", 0.0) - 2 * 64 * 128 * 32) / (2 * 64 * 128 * 32) < 0.5


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        t.start()
        x = jnp.ones((8, 8)) * 2
        t.stop(x)
    assert len(t.times) == 2 and np.isfinite(t.mean)
