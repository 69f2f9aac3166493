"""Device (XLA/TPU) dense-statevector engine for VQE/ADAPT.

The reference evaluates ansatz states by binding a qiskit circuit and calling
``qiskit.quantum_info.Statevector`` (variational_optimization.py:88), then
contracts scipy matrices on the host.  Here the WHOLE objective

    E(x) = <ref| U(x)^dag H U(x) |ref>,   U(x) = prod_k e^{i x_k P_k}

is one jit-compiled device program: each Pauli exponential acts on the dense
state as an XOR-permutation with a phase mask (the one-sparse action, cf.
kernels/dense.py), the Hamiltonian expectation is a ``lax.scan`` over terms,
and the gradient comes from ``jax.grad`` -- mathematically identical to the
reference's parameter-shift values (the +-pi/4 shift rule is exact for Pauli
generators) but computed in one fused backward pass instead of 2 * n_params
fresh statevector simulations.

Basis convention matches ``kernels/dense.py``: qubit 0 = most significant bit.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from ..kernels import dense


def _term_arrays(op, dtype):
    """(x_int, z_int, phase_re, phase_im) per term; phase = (-i)^{|Y|} c."""
    x_int = dense.plane_ints(op.x_pack, op.n_qubits)
    z_int = dense.plane_ints(op.z_pack, op.n_qubits)
    y_cnt = np.bitwise_count(op.x_pack & op.z_pack).sum(axis=1).astype(np.int64)
    phase = ((-1j) ** (y_cnt % 4)) * op.coeff_vec
    idt = np.int32 if op.n_qubits < 31 else np.int64
    return (
        x_int.astype(idt), z_int.astype(idt),
        np.ascontiguousarray(phase.real, dtype),
        np.ascontiguousarray(phase.imag, dtype),
    )


@functools.lru_cache(maxsize=32)
def _jitted_engine(n_qubits: int, n_params: int, n_terms: int, f64: bool,
                   mesh=None, axis_name: str = "terms"):
    """(loss, grad) jitted for the given shape signature.

    Shapes (not values) key the cache, so an optimizer loop reuses one
    compilation; ADAPT recompiles once per added excitation bucket.

    With ``mesh``, the Hamiltonian-term axis shards across devices: the
    ansatz evolution runs replicated (cheap: one dense state), each device
    accumulates its term slice of <psi|H|psi>, and one psum combines --
    multi-chip VQE over the observable axis.  ``jax.grad`` differentiates
    straight through the shard_map.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    cdt = jnp.complex128 if f64 else jnp.complex64
    fdt = jnp.float64 if f64 else jnp.float32
    idt = jnp.int32 if n_qubits < 31 else jnp.int64
    dim = 1 << n_qubits

    def loss(x, p0r, p0i, gxi, gzi, gpr, gpi, hxi, hzi, hpr, hpi):
        rows = jnp.arange(dim, dtype=idt)
        psi0 = (p0r + 1j * p0i).astype(cdt)

        def evolve(psi, tpl):
            xk, xi, zi, pr, pi = tpl
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            gpsi = (pr + 1j * pi) * sgn * psi[rows ^ xi]
            return jnp.cos(xk) * psi + 1j * jnp.sin(xk) * gpsi, None

        psi, _ = lax.scan(evolve, psi0, (x.astype(fdt), gxi, gzi, gpr, gpi))

        def hterm(acc, tpl):
            xi, zi, pr, pi = tpl
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            return acc + (pr + 1j * pi) * jnp.vdot(psi, sgn * psi[rows ^ xi]), None

        # carry seeded from the (possibly device-varying) term arrays so the
        # scan types check under shard_map's varying-axis rules
        acc0 = jnp.zeros((), cdt) + (hpr[0] * 0).astype(cdt)
        e, _ = lax.scan(hterm, acc0, (hxi, hzi, hpr, hpi))
        if mesh is not None:
            return lax.psum(e.real, axis_name)
        return e.real

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        rep = P()
        loss = jax.shard_map(
            loss, mesh=mesh,
            in_specs=(rep,) * 7 + (P(axis_name),) * 4,
            out_specs=rep,
        )
    return jax.jit(loss), jax.jit(jax.grad(loss, argnums=0))


class DeviceVQEEngine:
    """Bound (observable, generators, ref state) -> callable loss/gradient."""

    def __init__(self, observable, generators, ref_state):
        import jax
        import jax.numpy as jnp

        assert observable.n_qubits <= 26, (
            "device_array holds the dense 2^n statevector on device; "
            f"{observable.n_qubits} qubits exceeds the supported range"
        )
        # the evolve step computes cos(x)psi + i sin(x) c P psi, which equals
        # exp(i x c P) only for |c| == 1 (VQE_Driver.prepare_for_evolution
        # normalises; guard against direct callers that do not)
        assert generators.n_terms == 0 or np.allclose(
            np.abs(generators.coeff_vec), 1
        ), "DeviceVQEEngine requires unit-modulus generator coefficients"

        self.f64 = bool(jax.config.jax_enable_x64) and jax.default_backend() != "tpu"
        fdt = np.float64 if self.f64 else np.float32
        self.n_qubits = observable.n_qubits
        self.n_params = generators.n_terms
        gxi, gzi, gpr, gpi = _term_arrays(generators, fdt)
        # pad the generator axis to a power-of-two bucket with identity
        # no-ops (x_int = z_int = 0, phase 1, parameter pinned to 0):
        # exp(i*0*I) is exact identity, its gradient entry is exactly 0, and
        # the jit cache is keyed by shape -- so an ADAPT loop growing the
        # ansatz one excitation at a time recompiles once per bucket, not
        # once per cycle
        self._padded = max(1, 1 << (max(self.n_params, 1) - 1).bit_length())
        pad = self._padded - self.n_params
        if pad:
            gxi = np.concatenate([gxi, np.zeros(pad, gxi.dtype)])
            gzi = np.concatenate([gzi, np.zeros(pad, gzi.dtype)])
            gpr = np.concatenate([gpr, np.ones(pad, gpr.dtype)])
            gpi = np.concatenate([gpi, np.zeros(pad, gpi.dtype)])
        hxi, hzi, hpr, hpi = _term_arrays(observable, fdt)
        psi0 = ref_state.to_dense_matrix.reshape(-1)

        from ..config import config

        mesh = config.mesh
        n_terms = observable.n_terms
        if mesh is not None and int(mesh.devices.size) >= 2:
            # shard the Hamiltonian-term axis; zero-phase padding terms
            # contribute exactly 0 to the expectation
            n_dev = int(mesh.devices.size)
            Tp = -(-n_terms // n_dev) * n_dev
            padT = Tp - n_terms
            if padT:
                hxi = np.concatenate([hxi, np.zeros(padT, hxi.dtype)])
                hzi = np.concatenate([hzi, np.zeros(padT, hzi.dtype)])
                hpr = np.concatenate([hpr, np.zeros(padT, hpr.dtype)])
                hpi = np.concatenate([hpi, np.zeros(padT, hpi.dtype)])
            n_terms = Tp
        else:
            mesh = None

        rep_args = (
            np.ascontiguousarray(psi0.real, fdt),
            np.ascontiguousarray(psi0.imag, fdt),
            gxi, gzi, gpr, gpi,
        )
        h_args = (hxi, hzi, hpr, hpi)
        if mesh is None:
            self._args = tuple(jnp.asarray(a) for a in rep_args + h_args)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            shd = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._args = tuple(
                [jax.device_put(jnp.asarray(a), rep) for a in rep_args]
                + [jax.device_put(jnp.asarray(a), shd) for a in h_args]
            )
        self._loss, self._grad = _jitted_engine(
            self.n_qubits, self._padded, n_terms, self.f64,
            mesh=mesh, axis_name=mesh.axis_names[0] if mesh is not None else "terms",
        )

    def _pad_x(self, x):
        x = np.asarray(x, np.float64).reshape(-1)
        if len(x) < self._padded:
            x = np.concatenate([x, np.zeros(self._padded - len(x))])
        return x

    def loss(self, x) -> float:
        import jax.numpy as jnp

        return float(self._loss(jnp.asarray(self._pad_x(x)), *self._args))

    def gradient(self, x) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(
            self._grad(jnp.asarray(self._pad_x(x)), *self._args),
            dtype=np.float64,
        )[: self.n_params]

    @staticmethod
    def key(observable, generators, ref_state) -> Tuple:
        """Cheap identity for engine reuse across optimizer iterations."""
        from ..config import config

        return (
            id(config.mesh),
            observable.x_pack.tobytes(), observable.z_pack.tobytes(),
            observable.coeff_vec.tobytes(),
            generators.x_pack.tobytes(), generators.z_pack.tobytes(),
            generators.coeff_vec.tobytes(),
            ref_state._s_pack.tobytes(), ref_state._amps.tobytes(),
        )


@functools.lru_cache(maxsize=32)
def _jitted_pool_grad(n_qubits: int, f64: bool):
    """Jitted ADAPT pool gradient: every d_i = <psi| i[H, P_i] |psi> in one
    device program.

    Uses d_i = -2 Im <H psi | P_i psi> (H, P_i Hermitian), so the state and
    H|psi> are built once and each pool element costs one XOR-permutation --
    the reference instead materialises a full commutator OPERATOR per pool
    element and evaluates each expectation separately
    (variational_optimization.py:276-355)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    cdt = jnp.complex128 if f64 else jnp.complex64
    fdt = jnp.float64 if f64 else jnp.float32
    idt = jnp.int32 if n_qubits < 31 else jnp.int64
    dim = 1 << n_qubits

    def pool_grad(x, p0r, p0i, gxi, gzi, gpr, gpi, hxi, hzi, hpr, hpi,
                  pxi, pzi, ppr, ppi):
        rows = jnp.arange(dim, dtype=idt)
        psi = (p0r + 1j * p0i).astype(cdt)

        def evolve(psi, tpl):
            xk, xi, zi, pr, pi = tpl
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            gpsi = (pr + 1j * pi) * sgn * psi[rows ^ xi]
            return jnp.cos(xk) * psi + 1j * jnp.sin(xk) * gpsi, None

        psi, _ = lax.scan(evolve, psi, (x.astype(fdt), gxi, gzi, gpr, gpi))

        def hterm(acc, tpl):
            xi, zi, pr, pi = tpl
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            return acc + (pr + 1j * pi) * sgn * psi[rows ^ xi], None

        phi, _ = lax.scan(hterm, jnp.zeros(dim, cdt), (hxi, hzi, hpr, hpi))

        def pterm(_, tpl):
            xi, zi, pr, pi = tpl
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            z = jnp.vdot(phi, (pr + 1j * pi) * sgn * psi[rows ^ xi])
            return 0, -2.0 * z.imag

        _, ds = lax.scan(pterm, 0, (pxi, pzi, ppr, ppi))
        return ds

    return jax.jit(pool_grad)


def device_pool_gradient(observable, adapt_gens, ref_state, pool, x) -> np.ndarray:
    """ADAPT pool gradient on device (see _jitted_pool_grad)."""
    import jax
    import jax.numpy as jnp

    assert observable.n_qubits <= 26, (
        "device_array holds the dense 2^n statevector on device; "
        f"{observable.n_qubits} qubits exceeds the supported range"
    )

    f64 = bool(jax.config.jax_enable_x64) and jax.default_backend() != "tpu"
    fdt = np.float64 if f64 else np.float32
    gxi, gzi, gpr, gpi = _term_arrays(adapt_gens, fdt)
    hxi, hzi, hpr, hpi = _term_arrays(observable, fdt)
    pxi, pzi, ppr, ppi = _term_arrays(pool, fdt)
    psi0 = ref_state.to_dense_matrix.reshape(-1)
    fn = _jitted_pool_grad(observable.n_qubits, f64)
    out = fn(
        jnp.asarray(np.asarray(x, np.float64)),
        jnp.asarray(np.ascontiguousarray(psi0.real, fdt)),
        jnp.asarray(np.ascontiguousarray(psi0.imag, fdt)),
        *(jnp.asarray(a) for a in (gxi, gzi, gpr, gpi, hxi, hzi, hpr, hpi,
                                   pxi, pzi, ppr, ppi)),
    )
    return np.asarray(out, dtype=np.float64)
