# -*- coding: utf-8 -*-
"""Split-complex arithmetic for TPU.

The TPU backend in this environment supports no complex dtypes (no
`complex64` transfers, arithmetic, or FFT). The entire compute path is
therefore built on *split-complex* arrays: a `Complex` pytree holding
separate real/imag float arrays. This is also the faster layout for XLA on
TPU — re/im planes stay contiguous in lanes, elementwise ops fuse, and the
matmul-FFT engine (ops/fft.py) consumes the planes directly as real matmuls.

Replaces the role of complex numpy/torch arrays in the reference
(`/root/reference/ssqueezepy/utils/backend.py`).
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Complex:
    """Split-complex array: `z = re + 1j*im` with re/im as real arrays."""
    re: jax.Array
    im: jax.Array

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---- construction -----------------------------------------------------
    @staticmethod
    def from_numpy(z, dtype=None):
        z = np.asarray(z)
        if dtype is None:
            dtype = 'float64' if z.dtype in (np.complex128, np.float64) \
                else 'float32'
        return Complex(jnp.asarray(z.real.astype(dtype)),
                       jnp.asarray(z.imag.astype(dtype)))

    @staticmethod
    def from_real(x):
        x = jnp.asarray(x)
        return Complex(x, jnp.zeros_like(x))

    @staticmethod
    def zeros(shape, dtype='float32'):
        return Complex(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    # ---- conversion -------------------------------------------------------
    def to_numpy(self):
        re = np.asarray(self.re)
        im = np.asarray(self.im)
        return re + 1j * im

    def to_native(self):
        """To a native JAX complex array (CPU backend only)."""
        return jax.lax.complex(self.re, self.im)

    @staticmethod
    def from_native(z):
        return Complex(jnp.real(z), jnp.imag(z))

    # ---- properties -------------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    # ---- arithmetic -------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Complex):
            return Complex(self.re + o.re, self.im + o.im)
        return Complex(self.re + o, self.im)

    def __sub__(self, o):
        if isinstance(o, Complex):
            return Complex(self.re - o.re, self.im - o.im)
        return Complex(self.re - o, self.im)

    def __mul__(self, o):
        if isinstance(o, Complex):
            return Complex(self.re * o.re - self.im * o.im,
                           self.re * o.im + self.im * o.re)
        return Complex(self.re * o, self.im * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Complex):
            d = o.re * o.re + o.im * o.im
            return Complex((self.re * o.re + self.im * o.im) / d,
                           (self.im * o.re - self.re * o.im) / d)
        return Complex(self.re / o, self.im / o)

    def __neg__(self):
        return Complex(-self.re, -self.im)

    def __getitem__(self, idx):
        return Complex(self.re[idx], self.im[idx])

    def conj(self):
        return Complex(self.re, -self.im)

    def abs2(self):
        return self.re * self.re + self.im * self.im

    def abs(self):
        return jnp.sqrt(self.abs2())

    def mul_i(self):
        """Multiply by 1j."""
        return Complex(-self.im, self.re)

    def astype(self, dtype):
        return Complex(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape):
        return Complex(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes):
        return Complex(self.re.transpose(*axes), self.im.transpose(*axes))

    def sum(self, axis=None):
        return Complex(self.re.sum(axis), self.im.sum(axis))

    def mean(self, axis=None):
        return Complex(self.re.mean(axis), self.im.mean(axis))


def as_complex(z, dtype=None):
    """Coerce numpy (real or complex) / jax array / Complex to `Complex`."""
    if isinstance(z, Complex):
        return z if dtype is None else z.astype(dtype)
    if isinstance(z, np.ndarray):
        if np.iscomplexobj(z):
            return Complex.from_numpy(z, dtype)
        x = jnp.asarray(z if dtype is None else z.astype(dtype))
        return Complex(x, jnp.zeros_like(x))
    z = jnp.asarray(z)
    if jnp.iscomplexobj(z):
        c = Complex.from_native(z)
        return c if dtype is None else c.astype(dtype)
    if dtype is not None:
        z = z.astype(dtype)
    return Complex(z, jnp.zeros_like(z))


def cmul2(a, b):
    """(re, im)-PAIR complex multiply, for Pallas kernel bodies that
    carry split planes as plain tuples (shared by the WSST2/FSST2
    chirp-regression kernels — one definition so the numerics cannot
    drift between them)."""
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def cdiv2(a, b, tiny):
    """(re, im)-pair complex divide with the additive `tiny`
    denominator regularizer (matches the XLA twins' cdiv)."""
    d = b[0] * b[0] + b[1] * b[1] + tiny
    return ((a[0] * b[0] + a[1] * b[1]) / d,
            (a[1] * b[0] - a[0] * b[1]) / d)
