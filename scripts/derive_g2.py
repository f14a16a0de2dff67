"""Derive BLS12-381 / BLS12-377 G2 twist constants + subgroup generators.

Everything is computed from the public BLS family parameter x:
  r = x^4 - x^2 + 1,  q = ((x-1)^2 r)/3 + x,  t = x + 1
(cross-checked against the moduli already in fields/spec.py), so no
外部 constants need trusting.  The sextic-twist order over Fq2 is found
via the trace identities (t2 = t^2 - 2q, t2^2 - 4q^2 = -3 f2^2) and
validated by exponentiation; a deterministic generator is produced by
cofactor-clearing the first valid x-coordinate.

Run once; paste the printed constants into curves/ref.py.
"""

import sys
from math import isqrt

sys.path.insert(0, ".")

from zksaas_tpu.fields.spec import BLS12_377_FQ, BLS12_377_FR, BLS12_381_FQ, BLS12_381_FR

X381 = -0xD201000000010000
X377 = 0x8508C00000000001


def bls_params(x):
    r = x**4 - x**2 + 1
    q = ((x - 1) ** 2 * r) // 3 + x
    t = x + 1
    return q, r, t


class F2:
    """Fq2 = Fq[u]/(u^2 - nr), host ints."""

    def __init__(self, q, nr):
        self.q, self.nr = q, nr

    def add(self, a, b):
        return ((a[0] + b[0]) % self.q, (a[1] + b[1]) % self.q)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.q, (a[1] - b[1]) % self.q)

    def mul(self, a, b):
        q, nr = self.q, self.nr
        t0, t1 = a[0] * b[0], a[1] * b[1]
        t2 = (a[0] + a[1]) * (b[0] + b[1])
        return ((t0 + nr * t1) % q, (t2 - t0 - t1) % q)

    def pow(self, a, e):
        res, base = (1, 0), a
        while e:
            if e & 1:
                res = self.mul(res, base)
            base = self.mul(base, base)
            e >>= 1
        return res

    def inv(self, a):
        q, nr = self.q, self.nr
        norm = (a[0] * a[0] - nr * a[1] * a[1]) % q
        ni = pow(norm, -1, q)
        return ((a[0] * ni) % q, (-a[1] * ni) % q)

    def is_sq(self, a):
        return a == (0, 0) or self.pow(a, (self.q**2 - 1) // 2) == (1, 0)

    def sqrt(self, a):
        """Tonelli-Shanks in Fq2 (group order q^2 - 1)."""
        if a == (0, 0):
            return (0, 0)
        assert self.is_sq(a)
        n = self.q**2 - 1
        s = (n & -n).bit_length() - 1
        m = n >> s
        # find a nonsquare
        z = None
        for c0 in range(2, 50):
            for c1 in range(0, 3):
                cand = (c0, c1)
                if not self.is_sq(cand):
                    z = cand
                    break
            if z:
                break
        cexp = self.pow(z, m)
        u = self.pow(a, (m - 1) // 2)
        x = self.mul(a, u)
        b = self.mul(x, u)
        while b != (1, 0):
            # find least k with b^(2^k) = 1
            k, t = 0, b
            while t != (1, 0):
                t = self.mul(t, t)
                k += 1
            for _ in range(s - k - 1):
                cexp = self.mul(cexp, cexp)
            x = self.mul(x, cexp)
            cexp = self.mul(cexp, cexp)
            b = self.mul(b, cexp)
            s = k
        return x


def curve_add(F, a2, b2, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if y1 == y2:
            if y1 == (0, 0):
                return None
            num = F.add(F.mul((3, 0), F.mul(x1, x1)), a2)
            den = F.mul((2, 0), y1)
        else:
            return None
    else:
        num = F.sub(y2, y1)
        den = F.sub(x2, x1)
    lam = F.mul(num, F.inv(den))
    x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def curve_mul(F, a2, b2, P, k):
    acc, add = None, P
    while k:
        if k & 1:
            acc = curve_add(F, a2, b2, acc, add)
        add = curve_add(F, a2, b2, add, add)
        k >>= 1
    return acc


def derive(name, x, spec_q, spec_r, nr, twist_candidates):
    q, r, t = bls_params(x)
    assert q == spec_q.p, f"{name}: q formula mismatch"
    assert r == spec_r.p, f"{name}: r formula mismatch"
    assert pow(nr % q, (q - 1) // 2, q) == q - 1, f"{name}: nr is a square"
    F = F2(q, nr)

    t2 = t * t - 2 * q
    f2sq = (4 * q * q - t2 * t2) // 3
    f2 = isqrt(f2sq)
    assert f2 * f2 == f2sq
    orders = {q * q + 1 - tr for tr in
              (t2, -t2, (t2 + 3 * f2) // 2, (t2 - 3 * f2) // 2,
               (-t2 + 3 * f2) // 2, (-t2 - 3 * f2) // 2)}
    valid = [n for n in orders if n % r == 0]

    for b2 in twist_candidates:
        for n in sorted(valid):
            cof = n // r
            # find a point via incremental x
            for xi in range(1, 2000):
                for xc in ((xi, 0), (0, xi), (xi, 1)):
                    rhs = F.add(F.mul(F.mul(xc, xc), xc), b2)
                    if not F.is_sq(rhs):
                        continue
                    y = F.sqrt(rhs)
                    assert F.mul(y, y) == rhs
                    P = (xc, y)
                    if curve_mul(F, (0, 0), b2, P, n) is not None:
                        break  # wrong (curve order doesn't divide n)
                    G = curve_mul(F, (0, 0), b2, P, cof)
                    if G is None:
                        continue
                    assert curve_mul(F, (0, 0), b2, G, r) is None
                    print(f"# {name}: nr={nr} b2={b2} cofactor bits={cof.bit_length()}")
                    print(f"{name}_G2_B = {b2!r}")
                    print(f"{name}_G2_GEN_X = {G[0]!r}")
                    print(f"{name}_G2_GEN_Y = {G[1]!r}")
                    print(f"{name}_G2_COFACTOR = {cof:#x}")
                    return b2, G, cof
                else:
                    continue
                break
    raise AssertionError(f"{name}: no valid twist/generator found")


if __name__ == "__main__":
    # BLS12-381: Fq2 = Fq[u]/(u^2+1), M-twist b2 = 4(1+u) (standard)
    derive("BLS12_381", X381, BLS12_381_FQ, BLS12_381_FR, -1, [(4, 4)])
    # BLS12-377: Fq2 = Fq[u]/(u^2+5)  (ark NONRESIDUE = -5), D-twist
    q377 = BLS12_377_FQ.p
    inv5 = pow(5, -1, q377)
    derive(
        "BLS12_377", X377, BLS12_377_FQ, BLS12_377_FR, -5,
        [(0, (-inv5) % q377), (0, 1)],  # b/u = -u/5 ; b*u = u
    )
    # standard BLS12-381 G2 generator (spec constants), for interop:
    gx = (
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    )
    gy = (
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    )
    q, r, _ = bls_params(X381)
    F = F2(q, -1)
    b2 = (4, 4)
    rhs = F.add(F.mul(F.mul(gx, gx), gx), b2)
    assert F.mul(gy, gy) == rhs, "spec G2 gen not on twist!"
    assert curve_mul(F, (0, 0), b2, (gx, gy), r) is None, "spec G2 gen wrong order!"
    print("# BLS12-381 spec G2 generator verified on-curve with order r — use it.")
