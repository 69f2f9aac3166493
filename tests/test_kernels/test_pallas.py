"""Pallas kernel tests (interpret mode on the CPU backend)."""
import numpy as np
import jax.numpy as jnp

from symmer_tpu.kernels import np_core, pack
from symmer_tpu.kernels.pallas_gf2 import anticommutes_tiled

rng = np.random.default_rng(0)


def test_pallas_anticommutes_matches_host():
    for (M1, M2, n) in [(300, 70, 100), (10, 600, 40), (256, 256, 64)]:
        strs1 = ["".join(rng.choice(list("IXYZ"), n)) for _ in range(M1)]
        strs2 = ["".join(rng.choice(list("IXYZ"), n)) for _ in range(M2)]
        x1, z1, _ = pack.strings_to_planes(strs1)
        x2, z2, _ = pack.strings_to_planes(strs2)
        host = np_core.anticommutes(x1, z1, x2, z2)
        dev = np.asarray(
            anticommutes_tiled(
                jnp.asarray(pack.to_u32(x1)), jnp.asarray(pack.to_u32(z1)),
                jnp.asarray(pack.to_u32(x2)), jnp.asarray(pack.to_u32(z2)),
            )
        )
        assert np.array_equal(host, dev), (M1, M2)


def test_pallas_anticommutes_reachable_from_dispatch():
    """config.pallas_anticommutes routes the public adjacency query through
    the Pallas kernel (interpreter mode on CPU)."""
    import numpy as np

    from symmer_tpu import PauliwordOp
    from symmer_tpu.config import config

    np.random.seed(9)
    a = PauliwordOp.random(20, 30)
    b = PauliwordOp.random(20, 17)
    expected = a.commutes_termwise(b)
    old_b, old_p = config.backend, config.pallas_anticommutes
    try:
        config.backend = "device"
        config.pallas_anticommutes = True
        got = a.commutes_termwise(b)
    finally:
        config.backend, config.pallas_anticommutes = old_b, old_p
    assert np.array_equal(got, expected)
