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


def _term_arrays(op, dtype, df: bool = False):
    """(x_int, z_int, phase_re, phase_im) per term; phase = (-i)^{|Y|} c.

    With ``df`` the phase planes are (T, 2) double-float [hi, lo] pairs
    (jx_df) so the dense engine carries chemistry precision on chip."""
    x_int = dense.plane_ints(op.x_pack, op.n_qubits)
    z_int = dense.plane_ints(op.z_pack, op.n_qubits)
    y_cnt = np.bitwise_count(op.x_pack & op.z_pack).sum(axis=1).astype(np.int64)
    phase = ((-1j) ** (y_cnt % 4)) * op.coeff_vec
    idt = np.int32 if op.n_qubits < 31 else np.int64
    if df:
        from ..kernels import jx_df

        pr, pi = jx_df.host_split_complex(phase)
        return (x_int.astype(idt), z_int.astype(idt), pr, pi)
    return (
        x_int.astype(idt), z_int.astype(idt),
        np.ascontiguousarray(phase.real, dtype),
        np.ascontiguousarray(phase.imag, dtype),
    )


@functools.lru_cache(maxsize=32)
def _jitted_engine(n_qubits: int, n_params: int, n_terms: int, f64: bool,
                   df: bool = False, mesh=None, axis_name: str = "terms"):
    """(loss, grad) jitted for the given shape signature.

    Shapes (not values) key the cache, so an optimizer loop reuses one
    compilation; ADAPT recompiles once per added excitation bucket.

    With ``df`` the statevector and all phases are double-float [hi, lo]
    lane tuples (jx_df): the energy VALUE reaches ~1e-13 of an exact f64
    statevector on an f32-only chip.  The gradient differentiates the hi
    chain (the error-term expressions are algebraically zero under AD), so
    its accuracy stays f32-level -- exactly what an optimizer needs: values
    converge at chemistry precision, directions at float precision.

    With ``mesh``, the Hamiltonian-term axis shards across devices: the
    ansatz evolution runs replicated (cheap: one dense state), each device
    accumulates its term slice of <psi|H|psi>, and one psum combines --
    multi-chip VQE over the observable axis.  ``jax.grad`` differentiates
    straight through the shard_map.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..kernels import jx_core, jx_df

    cdt = jnp.complex128 if f64 else jnp.complex64
    fdt = jnp.float64 if f64 else jnp.float32
    idt = jnp.int32 if n_qubits < 31 else jnp.int64
    dim = 1 << n_qubits

    def loss_plain(x, p0r, p0i, gxi, gzi, gpr, gpi, hxi, hzi, hpr, hpi):
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

    def loss_df(tc, ts, p0r, p0i, gxi, gzi, gpr, gpi, hxi, hzi, hpr, hpi):
        """Returns the energy as a double-float (rh, rl) pair.

        ``tc, ts``: (n_params, 2) double-float cos/sin of the parameters,
        evaluated on HOST in f64 (device f32 trig of a traced angle caps the
        whole engine at ~1e-7; the parameter enters the computation only
        through its trig values, so shipping them exactly restores the df
        budget).  dE/dx is assembled by the caller from grads w.r.t. tc/ts.
        """
        rows = jnp.arange(dim, dtype=idt)
        psi = (p0r[:, 0], p0r[:, 1], p0i[:, 0], p0i[:, 1])

        def evolve(psi, tpl):
            tck, tsk, xi, zi, pr, pi = tpl  # (2,) df pairs
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            perm = tuple(l[rows ^ xi] for l in psi)
            ph = (pr[0], pr[1], pi[0], pi[1])
            gpsi = jx_core.c_scale_exact(jx_core.c_mul(ph, perm, True), sgn)
            new = jx_core.c_add(
                jx_core.c_scale_df(psi, tck, True),
                jx_core.c_ipow(1, jx_core.c_scale_df(gpsi, tsk, True), True),
                True,
            )
            return new, None

        psi, _ = lax.scan(evolve, psi, (tc, ts, gxi, gzi, gpr, gpi))
        conj_psi = (psi[0], psi[1], -psi[2], -psi[3])

        def hterm(acc, tpl):
            xi, zi, pr, pi = tpl
            sgn = (1 - 2 * (lax.population_count(rows & zi) & 1)).astype(fdt)
            perm = tuple(l[rows ^ xi] for l in psi)
            ph = (pr[0], pr[1], pi[0], pi[1])
            y = jx_core.c_scale_exact(jx_core.c_mul(ph, perm, True), sgn)
            prod = jx_core.c_mul(conj_psi, y, True)
            rh, rl = jx_df.df_sum(prod[0], prod[1])
            return jx_df.df_add(acc[0], acc[1], rh, rl), None

        # both carry lanes seeded from the (possibly device-varying) term
        # arrays so the scan types check under shard_map's varying-axis rules
        vary0 = hpr[0, 0] * 0
        acc0 = (jnp.zeros((), fdt) + vary0, jnp.zeros((), fdt) + vary0)
        (eh, el), _ = lax.scan(hterm, acc0, (hxi, hzi, hpr, hpi))
        if mesh is not None:
            # psum hi and lo lanes separately; the O(n_dev eps32) merge error
            # is far below the df budget
            return lax.psum(eh, axis_name), lax.psum(el, axis_name)
        return eh, el

    if df:
        loss_pair = loss_df
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            rep = P()
            loss_pair = jax.shard_map(
                loss_pair, mesh=mesh,
                in_specs=(rep,) * 8 + (P(axis_name),) * 2
                + (P(axis_name, None),) * 2,
                out_specs=(rep, rep),
            )

        def loss_scalar(*args):
            eh, el = loss_pair(*args)
            return eh + el

        return (
            jax.jit(loss_pair),
            jax.jit(jax.grad(loss_scalar, argnums=(0, 1))),
        )

    loss = loss_plain
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
        # exp(i x c P) only when c^2 == 1, i.e. c is REAL +-1 (complex
        # unit-modulus c like i gives (cP)^2 = -I and a hyperbolic evolution).
        # VQE_Driver.prepare_for_evolution normalises; guard direct callers.
        assert generators.n_terms == 0 or (
            np.allclose(generators.coeff_vec.imag, 0)
            and np.allclose(np.abs(generators.coeff_vec.real), 1)
        ), "DeviceVQEEngine requires real +-1 generator coefficients"

        from ..kernels.dispatch import _df_mode

        self.f64 = bool(jax.config.jax_enable_x64) and jax.default_backend() != "tpu"
        # extended precision on f32-only backends: double-float [hi, lo]
        # phases and statevector lanes (config.device_precision)
        self.df = (not self.f64) and _df_mode()
        fdt = np.float64 if self.f64 else np.float32
        self.n_qubits = observable.n_qubits
        self.n_params = generators.n_terms
        gxi, gzi, gpr, gpi = _term_arrays(generators, fdt, df=self.df)
        # pad the generator axis to a power-of-two bucket with identity
        # no-ops (x_int = z_int = 0, phase 1, parameter pinned to 0):
        # exp(i*0*I) is exact identity, its gradient entry is exactly 0, and
        # the jit cache is keyed by shape -- so an ADAPT loop growing the
        # ansatz one excitation at a time recompiles once per bucket, not
        # once per cycle
        self._padded = max(1, 1 << (max(self.n_params, 1) - 1).bit_length())
        pad = self._padded - self.n_params
        if pad:
            def _pad_phase(a, one):
                fill = np.zeros((pad,) + a.shape[1:], a.dtype)
                if one:
                    fill[..., 0] = 1  # hi lane (or the plain value) = 1
                return np.concatenate([a, fill]) if a.ndim > 1 else np.concatenate(
                    [a, np.ones(pad, a.dtype) if one else np.zeros(pad, a.dtype)]
                )

            gxi = np.concatenate([gxi, np.zeros(pad, gxi.dtype)])
            gzi = np.concatenate([gzi, np.zeros(pad, gzi.dtype)])
            gpr = _pad_phase(gpr, one=True)
            gpi = _pad_phase(gpi, one=False)
        hxi, hzi, hpr, hpi = _term_arrays(observable, fdt, df=self.df)
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
                def _padT0(a):
                    return np.concatenate(
                        [a, np.zeros((padT,) + a.shape[1:], a.dtype)]
                    )

                hxi, hzi, hpr, hpi = map(_padT0, (hxi, hzi, hpr, hpi))
            n_terms = Tp
        else:
            mesh = None

        if self.df:
            from ..kernels import jx_df

            p0r, p0i = jx_df.host_split_complex(psi0)
        else:
            p0r = np.ascontiguousarray(psi0.real, fdt)
            p0i = np.ascontiguousarray(psi0.imag, fdt)
        rep_args = (p0r, p0i, gxi, gzi, gpr, gpi)
        h_args = (hxi, hzi, hpr, hpi)
        if mesh is None:
            self._args = tuple(jnp.asarray(a) for a in rep_args + h_args)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            ax = mesh.axis_names[0]
            self._args = tuple(
                [jax.device_put(jnp.asarray(a), rep) for a in rep_args]
                + [
                    jax.device_put(
                        jnp.asarray(a),
                        NamedSharding(
                            mesh, P(ax, None) if a.ndim == 2 else P(ax)
                        ),
                    )
                    for a in h_args
                ]
            )
        self._loss, self._grad = _jitted_engine(
            self.n_qubits, self._padded, n_terms, self.f64, self.df,
            mesh=mesh, axis_name=mesh.axis_names[0] if mesh is not None else "terms",
        )

    def _pad_x(self, x):
        x = np.asarray(x, np.float64).reshape(-1)
        if len(x) < self._padded:
            x = np.concatenate([x, np.zeros(self._padded - len(x))])
        return x

    def _trig_args(self, x):
        """(cos, sin) of the padded parameters as (n, 2) double-float pairs
        from exact host-f64 evaluation."""
        import jax.numpy as jnp

        from ..kernels import jx_df

        c64 = np.cos(x)
        s64 = np.sin(x)
        ch, cl = jx_df.host_split_f64(c64)
        sh, sl = jx_df.host_split_f64(s64)
        return (
            jnp.asarray(np.stack([ch, cl], axis=-1)),
            jnp.asarray(np.stack([sh, sl], axis=-1)),
            c64, s64,
        )

    def loss(self, x) -> float:
        import jax.numpy as jnp

        xp = self._pad_x(x)
        if self.df:
            tc, ts, _, _ = self._trig_args(xp)
            eh, el = self._loss(tc, ts, *self._args)
            return float(np.asarray(eh)) + float(np.asarray(el))
        return float(self._loss(jnp.asarray(xp), *self._args))

    def gradient(self, x) -> np.ndarray:
        import jax.numpy as jnp

        xp = self._pad_x(x)
        if self.df:
            # dE/dx = dE/dcos * (-sin) + dE/dsin * cos, chain rule assembled
            # on host with the exact f64 trig values.  Both [hi, lo] lanes
            # enter the represented value ADDITIVELY, so each lane's partial
            # already carries the full dE/dcos -- take the hi lane (summing
            # would double-count)
            tc, ts, c64, s64 = self._trig_args(xp)
            g_tc, g_ts = self._grad(tc, ts, *self._args)
            g_cos = np.asarray(g_tc, np.float64)[..., 0]
            g_sin = np.asarray(g_ts, np.float64)[..., 0]
            return (g_cos * (-s64) + g_sin * c64)[: self.n_params]
        return np.asarray(
            self._grad(jnp.asarray(xp), *self._args),
            dtype=np.float64,
        )[: self.n_params]

    @staticmethod
    def key(observable, generators, ref_state) -> Tuple:
        """Cheap identity for engine reuse across optimizer iterations.

        Content-based throughout: id()-based components are unsafe here
        (CPython recycles freed addresses, so a stale id can alias a new
        object and serve an engine built for different inputs)."""
        from ..config import config

        mesh = config.mesh
        mesh_key = (
            None
            if mesh is None
            else (mesh.axis_names, tuple(d.id for d in mesh.devices.flat))
        )
        return (
            mesh_key,
            config.device_precision,
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

    # the evolve step computes cos(x) psi + i sin(x) c P psi, which equals
    # exp(i x c P) only for real c with |c| == 1 -- the guard
    # DeviceVQEEngine asserts for exactly this reason
    assert adapt_gens.n_terms == 0 or (
        np.allclose(adapt_gens.coeff_vec.imag, 0)
        and np.allclose(np.abs(adapt_gens.coeff_vec.real), 1)
    ), (
        "pool-gradient generators must carry real +-1 coefficients; "
        "normalise via prepare_for_evolution first"
    )
    f64 = bool(jax.config.jax_enable_x64) and jax.default_backend() != "tpu"
    fdt = np.float64 if f64 else np.float32
    gxi, gzi, gpr, gpi = _term_arrays(adapt_gens, fdt)
    # pow2-bucket the generator axis: the ansatz GROWS every ADAPT cycle,
    # and unpadded shapes force a full retrace/recompile per cycle (the
    # bucket convention DeviceVQEEngine documents).  Padding is exact:
    # identity generators (x=z=0, phase 1) at angle 0 evolve psi -> psi.
    n_g = gxi.shape[0]
    cap = 1 << max(0, int(np.ceil(np.log2(max(1, n_g)))))
    x = np.asarray(x, np.float64)
    if cap > n_g:
        pad = cap - n_g
        gxi = np.concatenate([gxi, np.zeros(pad, gxi.dtype)])
        gzi = np.concatenate([gzi, np.zeros(pad, gzi.dtype)])
        gpr = np.concatenate([gpr, np.ones(pad, gpr.dtype)])
        gpi = np.concatenate([gpi, np.zeros(pad, gpi.dtype)])
        x = np.concatenate([x, np.zeros(pad)])
    hxi, hzi, hpr, hpi = _term_arrays(observable, fdt)
    pxi, pzi, ppr, ppi = _term_arrays(pool, fdt)
    psi0 = ref_state.to_dense_matrix.reshape(-1)
    fn = _jitted_pool_grad(observable.n_qubits, f64)
    out = fn(
        jnp.asarray(x),
        jnp.asarray(np.ascontiguousarray(psi0.real, fdt)),
        jnp.asarray(np.ascontiguousarray(psi0.imag, fdt)),
        *(jnp.asarray(a) for a in (gxi, gzi, gpr, gpi, hxi, hzi, hpr, hpi,
                                   pxi, pzi, ppr, ppi)),
    )
    return np.asarray(out, dtype=np.float64)
