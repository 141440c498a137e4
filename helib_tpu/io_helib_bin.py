"""Reader for HElib's LEGACY BINARY serialization format.

The reference ships endianness golden fixtures
(tests/test_resources/iotest_bin{LE,BE}.bin, referenced from
tests/CMakeLists.txt:96-99) written by the v1-era binary writers
(misc/legacy_tests/Test_Bin_IO.cpp; primitives in src/binio.cpp:19-145).
This is the format deployed HElib v1 installations exchanged on disk.

Wire format (reverse-engineered against the ASCII twin fixture, which the
same test run wrote from the same objects — iotest_binLE.bin and
iotest_asciiLE.txt contain bit-identical key material):

  * eye catchers: 4-byte tags |BS[ ]BS| |CN[ ]CN| |PK[ ]PK| |SK[ ]SK|
    |CX[ ]CX| |KM[ ]KM|  (src/binio.h:36-53 lists the modern set; the v1
    fixtures use BS for the context base)
  * raw ints: 64-bit little-endian (write_raw_int, binio.cpp:75 — the
    big-endian branch also emits little-endian byte order, which is why
    the BE fixture differs only in payload values, not layout)
  * NTL vec_long: int32 length, int32 intSize (4 or 8), then items
    (write_ntl_vec_long, binio.cpp:103)
  * IndexSet: int64 cardinality + elements
  * xdouble: double mantissa + int64 exponent (write_raw_xdouble)
  * ZZ: int64 byte count + little-endian magnitude (write_raw_ZZ)
  * base |BS[: p, r, m, gens (int64 len + items), ords ]BS|
  * context |CN[: stdev (double), smallPrimes set, ctxtPrimes set,
    nprimes, primes (int64 each), ndigits, digit sets, trailer ]CN|
  * Ctxt |CX[: ptxtSpace, noiseVar (xdouble), primeSet, nparts,
    parts = (DoubleCRT, SKHandle as 3 int64) ]CX|
  * DoubleCRT: IndexSet + one vec_long row per prime (phi(m) wide)
  * KS matrix |KM[: SKHandle, toKeyID, ptxtSpace, ncols, ncols DoubleCRTs
    (the b columns), PRG seed ZZ ]KM|
  * PubKey |PK[: base, pubEncrKey Ctxt, skHwts vec, nmatrices, matrices,
    keySwitchMap trailer ]PK|
  * SecKey |SK[: embedded PubKey, nkeys, per key a full-chain DoubleCRT
    ]SK|

Like io_helib (the text reader), this extracts the fields the
cross-validation tests need into a HelibLegacyDump.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .exceptions import IOError_
from .io_helib import HelibLegacyDump


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.off = 0

    def expect(self, tag: bytes):
        got = self.d[self.off:self.off + 4]
        if got != tag:
            raise IOError_(f"binary parse: expected {tag!r} at "
                           f"{self.off}, got {got!r}")
        self.off += 4

    def skip_to_after(self, tag: bytes):
        j = self.d.find(tag, self.off)
        if j < 0:
            raise IOError_(f"binary parse: closing {tag!r} not found")
        self.off = j + 4

    def i64(self):
        v = struct.unpack_from("<q", self.d, self.off)[0]
        self.off += 8
        return v

    def f64(self):
        v = struct.unpack_from("<d", self.d, self.off)[0]
        self.off += 8
        return v

    def xdouble(self):
        m = self.f64()
        e = self.i64()
        return m * (2.0 ** e) if -900 < e < 900 else m

    def iset(self):
        card = self.i64()
        if not 0 <= card <= 1 << 20:
            raise IOError_(f"binary parse: bad IndexSet card {card}")
        return [self.i64() for _ in range(card)]

    def vec_long(self):
        ln, sz = struct.unpack_from("<ii", self.d, self.off)
        self.off += 8
        if sz not in (4, 8) or not 0 <= ln <= 1 << 24:
            raise IOError_(f"binary parse: bad vec_long header ({ln},{sz})")
        fmt = "<q" if sz == 8 else "<i"
        out = [struct.unpack_from(fmt, self.d, self.off + sz * k)[0]
               for k in range(ln)]
        self.off += sz * ln
        return out

    def i64_vec(self):
        ln = self.i64()
        if not 0 <= ln <= 1 << 20:
            raise IOError_(f"binary parse: bad vector length {ln}")
        return [self.i64() for _ in range(ln)]

    def zz(self):
        nb = self.i64()
        if not 0 < nb <= 1 << 16:
            raise IOError_(f"binary parse: bad ZZ byte count {nb}")
        v = int.from_bytes(self.d[self.off:self.off + nb], "little")
        self.off += nb
        return v

    def dcrt(self):
        s = self.iset()
        rows = [self.vec_long() for _ in s]
        return s, rows


@dataclass
class HelibBinaryKSMatrix:
    handle: tuple          # (powerOfS, powerOfX, keyID)
    to_key: int
    ptxt_space: int
    b_columns: list        # [(prime idx list, rows)]
    prg_seed: int


@dataclass
class HelibBinaryDump(HelibLegacyDump):
    stdev: float = 3.2
    sk_hwts: list = field(default_factory=list)
    ks_matrices: list = field(default_factory=list)
    pub_noise: float = 0.0


def _read_base(r: _Reader):
    r.expect(b"|BS[")
    p, rr, m = r.i64(), r.i64(), r.i64()
    gens = r.i64_vec()
    ords = r.i64_vec()
    r.expect(b"]BS|")
    return m, p, rr, gens, ords


def _read_ctxt(r: _Reader):
    r.expect(b"|CX[")
    pspace = r.i64()
    noise = r.xdouble()
    pset = r.iset()
    nparts = r.i64()
    if not 0 <= nparts <= 16:
        raise IOError_(f"binary parse: bad part count {nparts}")
    parts = []
    for _ in range(nparts):
        s, rows = r.dcrt()
        handle = (r.i64(), r.i64(), r.i64())
        if s != pset:
            raise IOError_("binary parse: ctxt part prime-set mismatch")
        parts.append((handle, list(pset), rows))
    r.expect(b"]CX|")
    return pspace, noise, pset, parts


def _read_ks_matrix(r: _Reader):
    r.expect(b"|KM[")
    handle = (r.i64(), r.i64(), r.i64())
    to_key = r.i64()
    pspace = r.i64()
    ncols = r.i64()
    if not 0 < ncols <= 16:
        raise IOError_(f"binary parse: bad KS column count {ncols}")
    cols = []
    for _ in range(ncols):
        s, rows = r.dcrt()
        cols.append((s, rows))
    seed = r.zz()
    r.expect(b"]KM|")
    return HelibBinaryKSMatrix(handle, to_key, pspace, cols, seed)


def read_binary_dump(path: str) -> HelibBinaryDump:
    with open(path, "rb") as f:
        r = _Reader(f.read())
    m, p, rr, gens, ords = _read_base(r)

    r.expect(b"|CN[")
    stdev = r.f64()
    r.i64_vec()                 # smallPrimes (empty in the fixtures)
    r.i64_vec()                 # ctxtPrimes index set
    nprimes = r.i64()
    if not 0 < nprimes <= 1 << 16:
        raise IOError_(f"binary parse: bad prime count {nprimes}")
    primes = [r.i64() for _ in range(nprimes)]
    # digits + trailer: not needed, scan to the end tag
    r.skip_to_after(b"]CN|")

    r.expect(b"|PK[")
    base2 = _read_base(r)
    if base2 != (m, p, rr, gens, ords):
        raise IOError_("binary parse: PK base disagrees with file base")
    pub_space, pub_noise, _, pub_parts = _read_ctxt(r)
    sk_hwts = r.i64_vec()
    nmat = r.i64()
    if not 0 <= nmat <= 1 << 12:
        raise IOError_(f"binary parse: bad matrix count {nmat}")
    mats = [_read_ks_matrix(r) for _ in range(nmat)]
    r.skip_to_after(b"]PK|")    # keySwitchMap trailer

    r.expect(b"|SK[")
    r.expect(b"|PK[")
    r.off -= 4
    r.skip_to_after(b"]PK|")    # embedded PubKey (same as above)
    nkeys = r.i64()
    if not 0 < nkeys <= 64:
        raise IOError_(f"binary parse: bad secret-key count {nkeys}")
    sk_rows = None
    for _ in range(nkeys):
        s, rows = r.dcrt()
        if len(s) == nprimes:
            sk_rows = rows
    r.expect(b"]SK|")
    if sk_rows is None:
        raise IOError_("binary parse: no full-chain secret key found")

    return HelibBinaryDump(m=m, p=p, r=rr, gens=gens, ords=ords,
                           primes=primes, pub_enc_parts=pub_parts,
                           pub_ptxt_space=pub_space, sk_rows=sk_rows,
                           stdev=stdev, sk_hwts=sk_hwts, ks_matrices=mats,
                           pub_noise=pub_noise)
