"""Pallas batched FK-derivatives kernel vs the jnp analytic path."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rmp_tpu.models import robots
from rmp_tpu.models.fk_derivatives import fk_derivatives
import pytest

rng = np.random.default_rng(12)


@pytest.mark.slow
def test_pallas_fk_matches_reference_interpret():
    from rmp_tpu.ops.pallas_fk import BLOCK, fk_derivatives_batched

    model = robots.franka_panda()
    B = BLOCK
    q = jnp.asarray(rng.uniform(-1.2, 1.2, (B, model.n_q)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, (B, model.n_q)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        T16, Td16, J16, c16 = fk_derivatives_batched(model, q, qd)
    ref = jax.vmap(lambda a, b: fk_derivatives(model, a, b))(q, qd)
    for got, want, name in zip((T16, Td16, J16, c16), ref,
                               ("T", "Td", "J", "c")):
        np.testing.assert_allclose(np.asarray(got)[:64],
                                   np.asarray(want)[:64], atol=2e-4,
                                   err_msg=name)
