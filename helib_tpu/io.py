"""Serialization: binary + JSON for every persistent object.

TPU-native equivalent of reference io/binio/JsonWrapper
(/root/reference/src/binio.cpp, src/io.cpp): every persistent object
(Context, SecKey, PubKey, KSMatrix, Ctxt) has `writeTo`-style binary and
JSON forms.  Binary format: a JSON header line (metadata) followed by raw
little-endian uint32 array blobs; eye-catcher + version tags mirror the
reference's framing (binio.cpp eye-catchers).
"""

from __future__ import annotations

import io as _io
import json
from fractions import Fraction

import numpy as np

from .context import Context
from .exceptions import IOError_
from .keys import SecKey, PubKey, SKHandle, KSMatrix
from .ctxt import Ctxt

MAGIC = b"HTPU"
VERSION = 1


def _write_block(f, tag: str, meta: dict, arrays: list[np.ndarray]):
    hdr = dict(meta)
    hdr["_tag"] = tag
    hdr["_arrays"] = [list(a.shape) for a in arrays]
    hb = json.dumps(hdr).encode()
    f.write(MAGIC)
    f.write(VERSION.to_bytes(2, "little"))
    f.write(len(hb).to_bytes(4, "little"))
    f.write(hb)
    for a in arrays:
        f.write(np.ascontiguousarray(a, dtype=np.uint32).tobytes())


def _read_block(f, expect_tag: str):
    magic = f.read(4)
    if magic != MAGIC:
        raise IOError_(f"bad eye-catcher {magic!r}")
    ver = int.from_bytes(f.read(2), "little")
    if ver != VERSION:
        raise IOError_(f"unsupported serialization version {ver}")
    n = int.from_bytes(f.read(4), "little")
    hdr = json.loads(f.read(n).decode())
    if hdr["_tag"] != expect_tag:
        raise IOError_(f"expected {expect_tag!r} record, found {hdr['_tag']!r}")
    arrays = []
    for shape in hdr["_arrays"]:
        cnt = int(np.prod(shape)) if shape else 1
        buf = f.read(4 * cnt)
        arrays.append(np.frombuffer(buf, dtype=np.uint32).reshape(shape))
    return hdr, arrays


# ---------------------------------------------------------------------------
# Context
# ---------------------------------------------------------------------------

def context_meta(ctx: Context) -> dict:
    return {"m": ctx.m, "p": ctx.p, "r": ctx.r, "bits": ctx.bits,
            "c": ctx.c, "scheme": ctx.scheme, "stdev": ctx.stdev,
            "scale": ctx.scale}


def write_context(f, ctx: Context):
    _write_block(f, "Context", context_meta(ctx), [ctx.qs, ctx.sp])


def read_context(f) -> Context:
    hdr, arrays = _read_block(f, "Context")
    hdr.pop("_tag"), hdr.pop("_arrays")
    ctx = Context(**hdr)
    # primes are deterministic given params; verify identity
    if not np.array_equal(ctx.qs, arrays[0]):
        raise IOError_("prime chain mismatch on Context read")
    if not np.array_equal(ctx.sp, arrays[1]):
        raise IOError_("special prime mismatch on Context read")
    return ctx


def context_to_json(ctx: Context) -> str:
    d = context_meta(ctx)
    d["qs"] = [int(q) for q in ctx.qs]
    d["sp"] = [int(q) for q in ctx.sp]
    return json.dumps(d)


def context_from_json(s: str) -> Context:
    d = json.loads(s)
    qs, sp = d.pop("qs"), d.pop("sp")
    ctx = Context(**d)
    if [int(q) for q in ctx.qs] != qs:
        raise IOError_("prime chain mismatch on JSON Context read")
    return ctx


# ---------------------------------------------------------------------------
# Ctxt
# ---------------------------------------------------------------------------

def write_ctxt(f, ct: Ctxt):
    rf = Fraction(ct.ratFactor)
    meta = {"k": ct.k, "special": ct.special, "ptxt_space": ct.ptxt_space,
            "noise": ct.noise, "intFactor": ct.intFactor,
            "ratFactor": [str(rf.numerator), str(rf.denominator)],
            "ptxtMag": ct.ptxtMag,
            "handles": [[h.powS, h.powX, h.keyID] for h, _ in ct.parts]}
    _write_block(f, "Ctxt", meta, [np.asarray(d) for _, d in ct.parts])


def read_ctxt(f, ctx: Context, pubkey: PubKey) -> Ctxt:
    import jax.numpy as jnp
    hdr, arrays = _read_block(f, "Ctxt")
    parts = [(SKHandle(*h), jnp.asarray(a))
             for h, a in zip(hdr["handles"], arrays)]
    ct = Ctxt(ctx, pubkey, parts, hdr["k"], hdr["special"],
              hdr["ptxt_space"], hdr["noise"], hdr["intFactor"])
    num, den = hdr["ratFactor"]
    ct.ratFactor = Fraction(int(num), int(den))
    ct.ptxtMag = hdr["ptxtMag"]
    return ct


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

def write_seckey(f, sk: SecKey):
    arrays = [np.asarray(k["coeffs"] % (1 << 32), dtype=np.uint32)
              for k in sk.skeys]
    _write_block(f, "SecKey",
                 {"sk_bounds": [k["bound"] for k in sk.skeys]}, arrays)


def read_seckey(f, ctx: Context) -> SecKey:
    hdr, arrays = _read_block(f, "SecKey")
    sk = SecKey.__new__(SecKey)
    sk.ctx = ctx
    sk.rng = np.random.default_rng(0)
    from .dcrt import small_coeffs_to_rt
    bounds = hdr.get("sk_bounds") or [hdr["sk_bound"]]
    sk.skeys = []
    for raw, bound in zip(arrays, bounds):
        coeffs = raw.astype(np.int64)
        coeffs[coeffs > (1 << 31)] -= (1 << 32)
        sk.skeys.append({"coeffs": coeffs, "bound": bound,
                         "full": small_coeffs_to_rt(ctx, coeffs,
                                                    ctx.L, True)})
    sk.matrices = {}
    sk.pubkey = None
    return sk


def write_pubkey(f, pk: PubKey, include_matrices: bool = True):
    meta = {"enc_noise": pk.enc_noise, "sk_bound": pk.sk_bound,
            "handles": [[h.powS, h.powX, h.keyID] for h, _ in pk.enc_key],
            "matrices": []}
    arrays = [np.asarray(d) for _, d in pk.enc_key]
    if include_matrices:
        for key, W in pk.matrices.items():
            meta["matrices"].append(
                {"from": [W.from_handle.powS, W.from_handle.powX,
                          W.from_handle.keyID],
                 "ptxt_space": W.ptxt_space, "noise": W.noise,
                 "ncols": len(W.b), "prg_seed": W.prg_seed,
                 "to_key": W.to_key})
            for b in W.b:
                arrays.append(np.asarray(b))
            # a-columns: only written when no PRG seed is recorded
            # (reference keySwitching.h:67-108 stores just the seed)
            if W.prg_seed is None:
                for a in W.a:
                    arrays.append(np.asarray(a))
    _write_block(f, "PubKey", meta, arrays)


def read_pubkey(f, ctx: Context, sk: SecKey | None = None) -> PubKey:
    import jax.numpy as jnp
    hdr, arrays = _read_block(f, "PubKey")
    pk = PubKey.__new__(PubKey)
    pk.ctx = ctx
    pk.enc_noise = hdr["enc_noise"]
    pk.sk_bound = hdr["sk_bound"]
    nenc = len(hdr["handles"])
    pk.enc_key = [(SKHandle(*h), jnp.asarray(a))
                  for h, a in zip(hdr["handles"], arrays[:nenc])]
    pos = nenc
    matrices = {}
    for mm in hdr["matrices"]:
        nc = mm["ncols"]
        seed = mm.get("prg_seed")
        b = [jnp.asarray(a) for a in arrays[pos:pos + nc]]
        pos += nc
        if seed is None:
            a_ = [jnp.asarray(a) for a in arrays[pos:pos + nc]]
            pos += nc
        else:
            from .keys import regen_ks_a
            a_ = regen_ks_a(ctx, seed, nc)
        h = SKHandle(*mm["from"])
        to_key = mm.get("to_key", 0)
        mkey = ((h.powS, h.powX) if h.keyID == 0 and to_key == 0
                else (h.powS, h.powX, h.keyID, to_key))
        matrices[mkey] = KSMatrix(h, mm["ptxt_space"], b, a_,
                                  mm["noise"], seed, to_key)
    if sk is not None:
        # re-attach to a deserialized SecKey: share one dict (mirrors
        # PubKey.__init__) so later gen_ks_matrix calls land in both views
        sk.matrices.update(matrices)
        sk.pubkey = pk
        pk.matrices = sk.matrices
    else:
        # standalone PubKey: these matrices ARE the evaluation key —
        # relinearize/smart_automorph consume them via keys.find_ks_matrix
        pk.matrices = matrices
    return pk


# JSON forms (reference writeToJSON/readFromJSON; arrays base64-embedded) ----

import base64 as _b64


def ctxt_to_json(ct: Ctxt) -> str:
    rf = Fraction(ct.ratFactor)
    return json.dumps({
        "type": "Ctxt", "k": ct.k, "special": ct.special,
        "ptxt_space": ct.ptxt_space, "noise": ct.noise,
        "intFactor": ct.intFactor,
        "ratFactor": [str(rf.numerator), str(rf.denominator)],
        "ptxtMag": ct.ptxtMag,
        "parts": [{"handle": [h.powS, h.powX, h.keyID],
                   "shape": list(np.asarray(d).shape),
                   "data": _b64.b64encode(
                       np.ascontiguousarray(np.asarray(d), dtype=np.uint32)
                       .tobytes()).decode()}
                  for h, d in ct.parts]})


def ctxt_from_json(s: str, ctx: Context, pubkey: PubKey) -> Ctxt:
    import jax.numpy as jnp
    d = json.loads(s)
    if d["type"] != "Ctxt":
        raise IOError_(f"expected Ctxt record, found {d['type']!r}")
    parts = []
    for p in d["parts"]:
        arr = np.frombuffer(_b64.b64decode(p["data"]),
                            dtype=np.uint32).reshape(p["shape"])
        parts.append((SKHandle(*p["handle"]), jnp.asarray(arr)))
    ct = Ctxt(ctx, pubkey, parts, d["k"], d["special"], d["ptxt_space"],
              d["noise"], d["intFactor"])
    ct.ratFactor = Fraction(int(d["ratFactor"][0]), int(d["ratFactor"][1]))
    ct.ptxtMag = d["ptxtMag"]
    return ct


# convenience byte-level APIs ------------------------------------------------

def to_bytes(write_fn, *args) -> bytes:
    buf = _io.BytesIO()
    write_fn(buf, *args)
    return buf.getvalue()


def from_bytes(read_fn, data: bytes, *args):
    return read_fn(_io.BytesIO(data), *args)
