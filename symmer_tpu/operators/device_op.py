"""Device-resident Pauli-operator pipelines.

Every ``PauliwordOp`` operation dispatched to the device pays a full
host->device->host round trip -- the right trade for an isolated call, but a
pipeline of N large operations moves the operator across the transport 2N
times.  On a remote-attached chip (30 ms sync, tens of MB/s) the transfers
dominate everything.

``DeviceOperator`` keeps the packed planes in HBM between operations: one
upload at ``PauliwordOp.to_device()``, one download at ``.to_host()``, and in
between each step costs kernel time plus at most one scalar sync (the
survivor count, needed to pick the next static bucket shape).  Coefficients
follow ``config.device_precision`` (double-float [hi, lo] planes by default,
~1e-14 parity with host f64).

    H_dev = H.to_device()
    out = ((H_dev * H_dev).cleanup()
           .perform_rotations(rotations)
           .to_host())

The reference has no counterpart (its accelerators are in-process); this is
the TPU-native answer to "keep the data where the compute is".
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import config
from ..kernels import dispatch, pack


def _masks_compatible(a, b) -> bool:
    """True when two pending-projection masks agree (both absent, or
    identical free-column sets) -- the condition under which binary
    device-resident operations have a single consistent qubit indexing."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return a.shape == b.shape and bool(np.all(a == b))


class DeviceOperator:
    """A Pauli sum resident on the JAX device.

    Internal state: padded uint32 planes ``x32, z32`` (power-of-two bucket),
    coefficient planes ``cr, ci`` (plain or [hi, lo] double-float, following
    ``config.device_precision`` at upload time), a host-side valid-row count
    and the qubit count.  Instances are immutable; every operation returns a
    new ``DeviceOperator`` sharing no buffers.
    """

    __slots__ = ("x32", "z32", "cr", "ci", "n_valid", "n_qubits", "_free_mask")

    def __init__(self, x32, z32, cr, ci, n_valid: int, n_qubits: int,
                 free_mask=None):
        self.x32 = x32
        self.z32 = z32
        self.cr = cr
        self.ci = ci
        self.n_valid = int(n_valid)
        self.n_qubits = int(n_qubits)
        # set by clifford_rotate_project: bool[n_qubits] of FREE columns.
        # The projected planes stay at full word width with the stabilized
        # columns zeroed (= tapered operator tensor identity, so resident
        # follow-ups are exact); to_host() deletes the columns on download.
        self._free_mask = free_mask

    # -- host boundary ------------------------------------------------------

    @classmethod
    def from_host(cls, op) -> "DeviceOperator":
        """Upload a PauliwordOp (ONE transfer; bucket-padded planes)."""
        T = op.n_terms
        Tp = dispatch._next_bucket(T)
        return cls(
            dispatch._to_dev(op.x_pack, Tp),
            dispatch._to_dev(op.z_pack, Tp),
            *dispatch._coeff_to_dev(op.coeff_vec, Tp),
            T, op.n_qubits,
        )

    def to_host(self):
        """Download the valid rows as a PauliwordOp (ONE batched transfer).

        A pending projection column selection (``_free_mask``) is applied on
        the downloaded planes: the result is the REDUCED-qubit operator."""
        from .base import PauliwordOp

        x, z, c = dispatch._planes_from_dev(
            self.x32, self.z32, self.cr, self.ci, self.n_valid
        )
        n_qubits = self.n_qubits
        W = pack.n_words_for(n_qubits)
        if self._free_mask is not None:
            n_free = int(self._free_mask.sum())
            if x.shape[0]:
                x = pack.select_columns(x[:, :W], self._free_mask)
                z = pack.select_columns(z[:, :W], self._free_mask)
            n_qubits, W = n_free, pack.n_words_for(n_free)
        if x.shape[0] == 0:
            return PauliwordOp.empty(n_qubits).cleanup()
        return PauliwordOp.from_planes(x[:, :W], z[:, :W], c, n_qubits)

    @property
    def n_terms(self) -> int:
        return self.n_valid

    def copy(self) -> "DeviceOperator":
        """Instances are immutable (every operation returns a new object
        sharing no buffers), so copy is the identity -- present so generic
        operator-handling code (e.g. QubitTapering.taper_it's defensive
        copy) accepts resident operands."""
        return self

    def __repr__(self) -> str:
        return (
            f"DeviceOperator(n_qubits={self.n_qubits}, n_terms={self.n_valid}, "
            f"bucket={self.x32.shape[0]})"
        )

    # -- device-resident operations ----------------------------------------

    def _rebucket(self, ox, oz, ocr, oci, n: int) -> "DeviceOperator":
        # n may be 0 (fully cancelled); the BUFFER keeps at least one row but
        # n_valid stays truthful so to_host() returns an empty operator
        n = int(n)
        Tp = dispatch._next_bucket(max(n, 1))
        return DeviceOperator(
            ox[:Tp], oz[:Tp], ocr[:Tp], oci[:Tp], n, self.n_qubits,
            free_mask=self._free_mask,
        )

    def cleanup(self, zero_threshold: Optional[float] = None) -> "DeviceOperator":
        """Deduplicate terms on device (one scalar sync)."""
        import jax.numpy as jnp

        if zero_threshold is None:
            zero_threshold = config.zero_threshold
        out = dispatch._jitted()["cleanup_t"](
            self.x32, self.z32, self.cr, self.ci, self.n_valid,
            jnp.asarray(zero_threshold, dispatch._coeff_dtype()),
            dispatch._rel_floor(),
        )
        return self._rebucket(*out)

    def multiply(self, other: "DeviceOperator",
                 zero_threshold: float = 1e-15) -> "DeviceOperator":
        """Fused all-pairs product + cleanup on device (one scalar sync).

        The padded rows carry zero coefficients, so their products fall
        under the (required, nonzero) threshold and vanish.
        """
        import jax.numpy as jnp

        assert self.n_qubits == other.n_qubits, "qubit-count mismatch"
        if not _masks_compatible(self._free_mask, other._free_mask):
            raise ValueError(
                "device-resident multiply of operands with different pending "
                "projections (free-qubit masks differ): one operand indexes "
                "reduced qubits, the other full width.  Download with "
                ".to_host() (applies the column reduction) and re-upload, or "
                "project both operands with the same stabilizer set."
            )
        assert zero_threshold is not None and zero_threshold > 0, (
            "device-resident multiply requires a positive threshold "
            "(padding rows are dropped by it)"
        )
        out = dispatch._jitted()["mul_cleanup"](
            self.x32, self.z32, self.cr, self.ci,
            other.x32, other.z32, other.cr, other.ci,
            jnp.asarray(zero_threshold, dispatch._coeff_dtype()),
            dispatch._rel_floor(),
        )
        return self._rebucket(*out)

    def __mul__(self, other: "DeviceOperator") -> "DeviceOperator":
        return self.multiply(other)

    def perform_rotations(
        self, rotations: Sequence[Tuple[object, Optional[float]]],
        zero_threshold: Optional[float] = 1e-15,
    ) -> "DeviceOperator":
        """Apply a (PauliwordOp, angle) rotation sequence, staying on device.

        Clifford runs execute as single lax.scans; each non-Clifford step
        costs one scalar sync for the bucket re-size (dispatch.device_rotation_loop).
        """
        rot_planes = []
        for r, angle in rotations:
            assert r.n_terms == 1, "Only rotation by single Pauliword allowed here"
            assert r.n_qubits == self.n_qubits, "qubit-count mismatch"
            rot_planes.append((r.x_pack[0], r.z_pack[0], angle))
        # A pending projection (zeroed stabilized columns, _free_mask set)
        # survives rotations only when no generator has support on a
        # stabilized column -- rotations are indexed on the FULL qubit range,
        # so a generator touching a zeroed column would silently mix
        # reduced/unreduced semantics.  Check before any device work.
        if self._free_mask is not None:
            keep = pack.pack_bits(
                self._free_mask.reshape(1, -1), self.n_qubits
            )[0]
            for rx_row, rz_row, _ in rot_planes:
                if np.any(rx_row & ~keep) or np.any(rz_row & ~keep):
                    raise ValueError(
                        "rotation generator touches a stabilized (projected-"
                        "out) qubit of this device-resident operator; "
                        "download with .to_host() first"
                    )
        dx, dz, dcr, dci, n = dispatch.device_rotation_loop(
            self.x32, self.z32, self.cr, self.ci, self.n_valid,
            rot_planes, zero_threshold,
        )
        return DeviceOperator(dx, dz, dcr, dci, n, self.n_qubits,
                              free_mask=self._free_mask)

    def clifford_rotate_project(
        self, rotations, rotated_stabilizers, free_qubit_mask,
        zero_threshold: float = 1e-15,
    ) -> "DeviceOperator":
        """Fused stabilizer-subspace projection, fully device-resident.

        The flagship taper/CS-VQE projection (Clifford rotation scan +
        commuting-term filter + eigenvalue sign flips + stabilized-column
        masking + cleanup) as ONE kernel on the resident planes -- one scalar
        sync, no operator transfer.  The host-in/host-out analog is
        dispatch.clifford_rotate_project; the S3Projection layer routes here
        when the operator is already resident.

        Args:
            rotations: (PauliwordOp, angle) Clifford rotation sequence.
            rotated_stabilizers: IndependentOp of single-qubit stabilizers
                (signs in coeff_vec give the eigenvalue assignments).
            free_qubit_mask: bool[n_qubits], True at columns to KEEP; the
                planes stay full-width with stabilized columns zeroed (the
                tapered operator tensor identity), to_host() deletes them.
        """
        import jax.numpy as jnp

        if self._free_mask is not None:
            raise ValueError(
                "operator already carries a pending projection; chain "
                "projections through .to_host() so the second stabilizer "
                "set indexes the reduced qubits"
            )
        rot = rotated_stabilizers
        rot_planes = [
            (r.x_pack[0], r.z_pack[0], angle) for r, angle in rotations
        ]
        W64 = pack.n_words_for(self.n_qubits)
        rx, rz, ms, neg_x, neg_z, col_keep = dispatch.projection_prep(
            rot_planes, rot.x_pack, rot.z_pack, rot.coeff_vec,
            np.asarray(free_qubit_mask, bool), W64,
        )
        row = lambda a: dispatch._to_dev(a.reshape(1, -1))[0]
        ox, oz, ocr, oci, n = dispatch._jitted_project()(
            self.x32, self.z32, self.cr, self.ci, self.n_valid,
            jnp.asarray(rx), jnp.asarray(rz), jnp.asarray(ms),
            dispatch._to_dev(rot.x_pack), dispatch._to_dev(rot.z_pack),
            row(neg_x), row(neg_z), row(col_keep),
            jnp.asarray(zero_threshold, dispatch._coeff_dtype()),
            dispatch._rel_floor(),
        )
        out = self._rebucket(ox, oz, ocr, oci, n)
        out._free_mask = np.asarray(free_qubit_mask, bool)
        return out

    def expval(self, psi) -> complex:
        """<psi|O|psi> against a (host) QuantumState: the operator planes
        stay resident; only the state uploads and one scalar pair returns
        (complex, matching PauliwordOp.expval / reference base.py:796-819 —
        non-Hermitian operators carry a meaningful imaginary part)."""
        import jax

        if psi.n_qubits != self.n_qubits:
            raise ValueError(
                f"state has {psi.n_qubits} qubits but the resident operator "
                f"indexes {self.n_qubits}"
                + (
                    " (a pending projection keeps the planes at FULL width; "
                    "expval needs a full-width state, or .to_host() for the "
                    "reduced-qubit operator)"
                    if self._free_mask is not None else ""
                )
            )
        # pow2-bucket the state axis (rows beyond n_basis are masked out),
        # so distinct state sizes share one compiled program; padded buffer
        # rows carry zero coefficients: exact 0 contribution
        B = psi._s_pack.shape[0]
        Bp = dispatch._next_bucket(B)
        ar, ai = dispatch._coeff_to_dev(psi._amps, pad_rows=Bp)
        sd = dispatch._to_dev(psi._s_pack, pad_rows=Bp)
        re, im = dispatch._jitted_expval()(
            self.x32, self.z32, self.cr, self.ci, sd, ar, ai, B,
        )
        re_h, im_h = jax.device_get((re, im))
        return dispatch._scalar_from_dev(re_h, im_h)

    def expval_iz(self) -> complex:
        """<0...0| O |0...0>: sum of I/Z-only coefficients (one scalar fetch
        -- the Clifford-simulator reduction, no operator download)."""
        re, im = _jitted_iz()(self.x32, self.cr, self.ci, self.n_valid)
        import jax

        re_h, im_h = jax.device_get((re, im))
        return dispatch._scalar_from_dev(re_h, im_h)


@functools.lru_cache(maxsize=None)
def _jitted_iz():
    import jax

    from ..kernels import jx_core

    return jax.jit(jx_core.expval_iz_sum)
