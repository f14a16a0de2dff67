"""Host big-int elliptic-curve + pairing oracle.

The stand-in for arkworks ark-ec/ark-bn254 used by the reference for
setup and verification (groth16/examples/sha256.rs:172-174, :389-415) —
pairings are off the hot path there too, so a CPU oracle is the right
altitude.  Affine coordinates, Python ints; Fp2 as (c0, c1) with
u^2 = -1; Fp12 as Fp[w]/(w^12 - 18 w^6 + 82) for the BN254 pairing
(polynomial-basis construction, same as the widely-used py_ecc layout).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.spec import (
    BLS12_377_FQ,
    BLS12_377_FR,
    BLS12_381_FQ,
    BLS12_381_FR,
    BN254_FQ,
    BN254_FR,
    FieldSpec,
)

# ---------------------------------------------------------------------------
# generic short-Weierstrass affine arithmetic over Fp or Fp2
# y^2 = x^3 + a x + b ;  None = point at infinity
# ---------------------------------------------------------------------------


class Coord:
    """Coordinate arithmetic: plain ints mod p."""

    def __init__(self, p: int):
        self.p = p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def muli(self, a, c: int):
        return (a * c) % self.p

    def inv(self, a):
        return pow(a, -1, self.p)

    def neg(self, a):
        return (-a) % self.p

    zero = 0
    one = 1

    def is_zero(self, a):
        return a == 0

    def eq(self, a, b):
        return a % self.p == b % self.p


class Coord2:
    """Fp2 = Fp[u]/(u^2 + 1): elements are (c0, c1) tuples."""

    def __init__(self, p: int):
        self.p = p
        self.zero = (0, 0)
        self.one = (1, 0)

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def mul(self, a, b):
        p = self.p
        t0 = a[0] * b[0]
        t1 = a[1] * b[1]
        t2 = (a[0] + a[1]) * (b[0] + b[1])
        return ((t0 - t1) % p, (t2 - t0 - t1) % p)

    def muli(self, a, c: int):
        return ((a[0] * c) % self.p, (a[1] * c) % self.p)

    def inv(self, a):
        p = self.p
        norm = (a[0] * a[0] + a[1] * a[1]) % p
        ninv = pow(norm, -1, p)
        return ((a[0] * ninv) % p, (-a[1] * ninv) % p)

    def neg(self, a):
        return ((-a[0]) % self.p, (-a[1]) % self.p)

    def is_zero(self, a):
        return a[0] % self.p == 0 and a[1] % self.p == 0

    def eq(self, a, b):
        return a[0] % self.p == b[0] % self.p and a[1] % self.p == b[1] % self.p


@dataclass(frozen=True)
class CurveRef:
    """One short-Weierstrass group (affine, host ints)."""

    name: str
    K: object  # Coord or Coord2
    a: object
    b: object
    gen: tuple  # (x, y) of the subgroup generator
    order: int  # subgroup order r

    def on_curve(self, P) -> bool:
        if P is None:
            return True
        x, y = P
        K = self.K
        lhs = K.mul(y, y)
        rhs = K.add(K.add(K.mul(K.mul(x, x), x), K.mul(self.a, x)), self.b)
        return K.eq(lhs, rhs)

    def add(self, P, Q):
        K = self.K
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if K.eq(x1, x2):
            if K.eq(y1, y2):
                if K.is_zero(y1):
                    return None
                # doubling
                num = K.add(K.muli(K.mul(x1, x1), 3), self.a)
                den = K.muli(y1, 2)
            else:
                return None
        else:
            num = K.sub(y2, y1)
            den = K.sub(x2, x1)
        lam = K.mul(num, K.inv(den))
        x3 = K.sub(K.sub(K.mul(lam, lam), x1), x2)
        y3 = K.sub(K.mul(lam, K.sub(x1, x3)), y1)
        return (x3, y3)

    def neg(self, P):
        if P is None:
            return None
        return (P[0], self.K.neg(P[1]))

    def mul(self, P, k: int):
        k %= self.order
        acc = None
        add = P
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.add(add, add)
            k >>= 1
        return acc

    def msm(self, points, scalars) -> object:
        acc = None
        for P, s in zip(points, scalars):
            acc = self.add(acc, self.mul(P, s))
        return acc

    def rand(self, rng) -> tuple:
        return self.mul(self.gen, rng.randrange(1, self.order))


# ---------------------------------------------------------------------------
# concrete curves
# ---------------------------------------------------------------------------

_bn_p = BN254_FQ.p
_bn_r = BN254_FR.p

BN254_G1 = CurveRef(
    name="bn254_g1",
    K=Coord(_bn_p),
    a=0,
    b=3,
    gen=(1, 2),
    order=_bn_r,
)

# G2 generator coordinates are the standard EIP-197 values (c0 real part
# listed second there; here tuples are (c0, c1)).
BN254_G2 = CurveRef(
    name="bn254_g2",
    K=Coord2(_bn_p),
    a=(0, 0),
    b=Coord2(_bn_p).mul((3, 0), Coord2(_bn_p).inv((9, 1))),  # 3 / (9 + u)
    gen=(
        (
            10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634,
        ),
        (
            8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531,
        ),
    ),
    order=_bn_r,
)

_bls_p = BLS12_381_FQ.p
_bls_r = BLS12_381_FR.p

BLS12_381_G1 = CurveRef(
    name="bls12_381_g1",
    K=Coord(_bls_p),
    a=0,
    b=4,
    gen=(
        0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
        0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    ),
    order=_bls_r,
)

_b377_p = BLS12_377_FQ.p
_b377_r = BLS12_377_FR.p

BLS12_377_G1 = CurveRef(
    name="bls12_377_g1",
    K=Coord(_b377_p),
    a=0,
    b=1,
    gen=(
        0x008848DEFE740A67C8FC6225BF87FF5485951E2CAA9D41BB188282C8BD37CB5CD5481512FFCD394EEAB9B16EB21BE9EF,
        0x01914A69C5102EFF1F674F5D30AFEEC4BD7FB348CA3E52D96D182AD44FB82305C2FE3D3634A9591AFD82DE55559C8EA6,
    ),
    order=_b377_r,
)

CURVES = {c.name: c for c in (BN254_G1, BN254_G2, BLS12_381_G1, BLS12_377_G1)}


# ---------------------------------------------------------------------------
# BN254 pairing (ate), Fp12 = Fp[w]/(w^12 - 18 w^6 + 82)
# ---------------------------------------------------------------------------

_FQ12_MOD = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0]  # w^12 = 18 w^6 - 82
_ATE_LOOP_COUNT = 29793968203157093288  # 6x + 2, x = 4965661367192848881


class FQ12:
    """Fp12 in polynomial basis; coeffs: list of 12 ints mod p."""

    __slots__ = ("c",)
    p = _bn_p

    def __init__(self, coeffs):
        assert len(coeffs) == 12
        self.c = [x % self.p for x in coeffs]

    @classmethod
    def one(cls):
        return cls([1] + [0] * 11)

    @classmethod
    def zero(cls):
        return cls([0] * 12)

    def __eq__(self, other):
        return self.c == other.c

    def __add__(self, other):
        return FQ12([a + b for a, b in zip(self.c, other.c)])

    def __sub__(self, other):
        return FQ12([a - b for a, b in zip(self.c, other.c)])

    def __mul__(self, other):
        if isinstance(other, int):
            return FQ12([a * other for a in self.c])
        p = self.p
        t = [0] * 23
        for i, a in enumerate(self.c):
            if a:
                for j, b in enumerate(other.c):
                    t[i + j] += a * b
        for i in range(22, 11, -1):
            top = t[i] % p
            if top:
                t[i - 6] += 18 * top
                t[i - 12] -= 82 * top
            t[i] = 0
        return FQ12(t[:12])

    def __pow__(self, e: int):
        res = FQ12.one()
        base = self
        while e:
            if e & 1:
                res = res * base
            base = base * base
            e >>= 1
        return res

    def inv(self):
        # extended Euclid over Fp[w] against the modulus polynomial
        p = self.p
        lm, hm = [1] + [0] * 12, [0] * 13
        low = self.c + [0]
        high = [m % p for m in _FQ12_MOD] + [1]

        def deg(poly):
            for i in reversed(range(len(poly))):
                if poly[i] % p:
                    return i
            return 0

        def poly_rounded_div(a, b):
            dega, degb = deg(a), deg(b)
            temp = [x for x in a]
            o = [0] * len(a)
            for i in range(dega - degb, -1, -1):
                q = (temp[degb + i] * pow(b[degb], -1, p)) % p
                o[i] = (o[i] + q) % p
                for c in range(degb + 1):
                    temp[c + i] = (temp[c + i] - q * b[c]) % p
            return [x % p for x in o]

        while deg(low):
            r = poly_rounded_div(high, low)
            r += [0] * (13 - len(r))
            nm = [x for x in hm]
            new = [x for x in high]
            for i in range(13):
                for j in range(13 - i):
                    nm[i + j] = (nm[i + j] - lm[i] * r[j]) % p
                    new[i + j] = (new[i + j] - low[i] * r[j]) % p
            lm, low, hm, high = nm, new, lm, low
        c0inv = pow(low[0], -1, p)
        return FQ12([(x * c0inv) % p for x in lm[:12]])

    def __truediv__(self, other):
        return self * other.inv()


_W = FQ12([0, 1] + [0] * 10)
_W2 = _W * _W
_W3 = _W2 * _W


def _twist(Q):
    """Map a BN254 G2 point ((x0,x1),(y0,y1)) to the curve over Fp12."""
    if Q is None:
        return None
    (x0, x1), (y0, y1) = Q
    # 'untwist' basis change: (x0 + x1 u) with u -> w^6 - 9
    xc = [(x0 - 9 * x1) % _bn_p, x1]
    yc = [(y0 - 9 * y1) % _bn_p, y1]
    nx = FQ12([xc[0]] + [0] * 5 + [xc[1]] + [0] * 5)
    ny = FQ12([yc[0]] + [0] * 5 + [yc[1]] + [0] * 5)
    return (nx * _W2, ny * _W3)


def _cast_g1(P):
    if P is None:
        return None
    return (FQ12([P[0]] + [0] * 11), FQ12([P[1]] + [0] * 11))


def _fq12_double(pt):
    x, y = pt
    lam = x * x * 3 / (y * 2)
    nx = lam * lam - x * 2
    return (nx, lam * (x - nx) - y)


def _fq12_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and y1 == y2:
        return _fq12_double(p1)
    if x1 == x2:
        return None
    lam = (y2 - y1) / (x2 - x1)
    nx = lam * lam - x1 - x2
    return (nx, lam * (x1 - nx) - y1)


def _linefunc(P1, P2, T):
    x1, y1 = P1
    x2, y2 = P2
    xt, yt = T
    if x1 != x2:
        m = (y2 - y1) / (x2 - x1)
        return m * (xt - x1) - (yt - y1)
    elif y1 == y2:
        m = x1 * x1 * 3 / (y1 * 2)
        return m * (xt - x1) - (yt - y1)
    else:
        return xt - x1


def miller_loop(Q, P):
    """Q: point over FQ12 (twisted G2), P: point over FQ12 (cast G1)."""
    if Q is None or P is None:
        return FQ12.one()
    R = Q
    f = FQ12.one()
    for b in reversed(range(_ATE_LOOP_COUNT.bit_length() - 1)):
        f = f * f * _linefunc(R, R, P)
        R = _fq12_double(R)
        if _ATE_LOOP_COUNT & (1 << b):
            f = f * _linefunc(R, Q, P)
            R = _fq12_add(R, Q)
    p = _bn_p
    Q1 = (Q[0] ** p, Q[1] ** p)
    nQ2 = (Q1[0] ** p, (FQ12.zero() - Q1[1]) ** p)
    f = f * _linefunc(R, Q1, P)
    R = _fq12_add(R, Q1)
    f = f * _linefunc(R, nQ2, P)
    return f


_FINAL_EXP = (_bn_p**12 - 1) // _bn_r


def pairing(P, Q):
    """Full BN254 pairing e(P in G1, Q in G2) -> FQ12 (unity-subgroup)."""
    if P is None or Q is None:
        return FQ12.one()
    return miller_loop(_twist(Q), _cast_g1(P)) ** _FINAL_EXP


def multi_pairing(pairs) -> FQ12:
    """prod e(P_i, Q_i) with a single shared final exponentiation."""
    f = FQ12.one()
    for P, Q in pairs:
        if P is None or Q is None:
            continue
        f = f * miller_loop(_twist(Q), _cast_g1(P))
    return f**_FINAL_EXP
