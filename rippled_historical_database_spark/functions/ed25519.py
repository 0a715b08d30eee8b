"""Pure-Python Ed25519 signature verification (RFC 8032 §5.1).

Driver-side only: manifest admission verifies ONE signature per
distinct manifest (first sighting -- manifests.js:379), so the hot
path is bounded by validator-key cardinality (hundreds), never by
sighting volume.  Python bignums are plenty for that; a 100 TB ingest
would verify the same few hundred manifests once.

Implements the cofactorless check ``[S]B == R + [h]A`` (the classic
ref10 / SUPERCOP verify used by the reference's `ed25519` npm module,
manifests.js:68) over the twisted Edwards curve
-x² + y² = 1 + d·x²y², p = 2²⁵⁵ - 19.  Public knowledge throughout:
RFC 8032 and the curve25519 literature (Bernstein et al.).
"""

from __future__ import annotations

import hashlib

P = 2**255 - 19
# group order l = 2^252 + 27742317777372353535851937790883648493
L = 2**252 + 27742317777372353535851937790883648493
D = (-121665 * pow(121666, P - 2, P)) % P

_IDENT = (0, 1, 1, 0)  # neutral element, extended coordinates


def _edwards_add(p: tuple, q: tuple) -> tuple:
    """Extended-coordinate point addition (RFC 8032 §5.1.4)."""
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % P
    b = (y1 + x1) * (y2 + x2) % P
    c = 2 * t1 * t2 * D % P
    dd = 2 * z1 * z2 % P
    e, f, g, h = b - a, dd - c, dd + c, b + a
    return (e * f % P, g * h % P, f * g % P, e * h % P)


def _scalar_mul(s: int, p: tuple) -> tuple:
    q = _IDENT
    while s:
        if s & 1:
            q = _edwards_add(q, p)
        p = _edwards_add(p, p)
        s >>= 1
    return q


def _recover_x(y: int, sign: int) -> int | None:
    """x from y via x² = (y²-1)/(d·y²+1), RFC 8032 §5.1.3 step 3."""
    x2 = (y * y - 1) * pow(D * y * y + 1, P - 2, P) % P
    if x2 == 0:
        return None if sign else 0
    x = pow(x2, (P + 3) // 8, P)
    if (x * x - x2) % P:
        x = x * pow(2, (P - 1) // 4, P) % P
    if (x * x - x2) % P:
        return None
    if x & 1 != sign:
        x = P - x
    return x


def _decompress(s: bytes) -> tuple | None:
    if len(s) != 32:
        return None
    y = int.from_bytes(s, "little")
    sign = y >> 255
    y &= (1 << 255) - 1
    if y >= P:
        return None
    x = _recover_x(y, sign)
    if x is None:
        return None
    return (x, y, 1, x * y % P)


def _point_equal(p: tuple, q: tuple) -> bool:
    return (
        (p[0] * q[2] - q[0] * p[2]) % P == 0
        and (p[1] * q[2] - q[1] * p[2]) % P == 0
    )


# base point B: y = 4/5, x even (RFC 8032 §5.1)
_BY = 4 * pow(5, P - 2, P) % P
_BX = _recover_x(_BY, 0)
_B = (_BX, _BY, 1, _BX * _BY % P)


def ed25519_verify(public_key: bytes, message: bytes, signature: bytes) -> bool:
    """True iff ``signature`` (R ‖ S, 64 bytes) verifies ``message``
    under the 32-byte compressed ``public_key`` (RFC 8032 §5.1.7)."""
    if len(public_key) != 32 or len(signature) != 64:
        return False
    a = _decompress(public_key)
    if a is None:
        return False
    r = _decompress(signature[:32])
    if r is None:
        return False
    s = int.from_bytes(signature[32:], "little")
    if s >= L:  # malleability guard, RFC 8032 §5.1.7 step 1
        return False
    h = (
        int.from_bytes(
            hashlib.sha512(signature[:32] + public_key + message).digest(),
            "little",
        )
        % L
    )
    return _point_equal(_scalar_mul(s, _B), _edwards_add(r, _scalar_mul(h, a)))
