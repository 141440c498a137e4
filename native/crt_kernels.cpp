// Native host-side exact-integer kernels for the RNS <-> integer boundary.
//
// Role of the reference's NTL/GMP bignum layer at the DoubleCRT::toPoly /
// Ctxt::rawModSwitch boundary (/root/reference/src/DoubleCRT.cpp:925-1110,
// src/Ctxt.cpp:2949): CRT-recombine per-prime residues into exact (balanced)
// multi-precision integers.  This is the one hot path that genuinely wants
// arbitrary-precision integer arithmetic on the host; everything else runs
// on-device in RNS.  Implemented with fixed-width 64-bit limb vectors and
// __int128 multiply-accumulate -- no external bignum library.
//
// Exact CRT recombination strategy: with Q = prod q_i, Q_i = Q/q_i,
//   x = sum_i [r_i * (Q_i^{-1} mod q_i)]_{q_i} * Q_i  - k*Q,
//   k = floor(sum_i t_i / q_i)   (t_i the bracketed residues)
// The float estimate of k uses long double (64-bit mantissa); it is off by
// at most 1 for L <= 2^10 primes, fixed up by exact limb compares.
//
// C ABI, loaded from Python via ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#ifdef _OPENMP
#include <omp.h>
#endif

typedef unsigned __int128 u128;

namespace {

struct CrtCtx {
  int L;          // number of primes
  int W;          // limb words per bignum
  uint64_t *qs;   // [L]
  uint64_t *inv;  // [L]  (Q_i)^{-1} mod q_i
  uint64_t *Qi;   // [L*W] Q/q_i, little-endian limbs
  uint64_t *Q;    // [W]
  uint64_t *Qhalf;// [W]  floor(Q/2)
  long double Qld;
};

// ---- limb helpers (little-endian, fixed width W) --------------------------

static inline void bn_zero(uint64_t *a, int W) { memset(a, 0, 8 * W); }

static int bn_cmp(const uint64_t *a, const uint64_t *b, int W) {
  for (int i = W - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
  }
  return 0;
}

static void bn_add(uint64_t *a, const uint64_t *b, int W) {
  u128 carry = 0;
  for (int i = 0; i < W; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    a[i] = (uint64_t)s;
    carry = s >> 64;
  }
}

// a -= b; returns borrow (1 if b > a)
static uint64_t bn_sub(uint64_t *a, const uint64_t *b, int W) {
  unsigned __int128 borrow = 0;
  for (int i = 0; i < W; ++i) {
    u128 d = (u128)a[i] - b[i] - (uint64_t)borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  return (uint64_t)borrow;
}

// a += m * b  (b: W words, m: u64)
static void bn_addmul(uint64_t *a, const uint64_t *b, uint64_t m, int W) {
  u128 carry = 0;
  for (int i = 0; i < W; ++i) {
    u128 s = (u128)a[i] + (u128)b[i] * m + carry;
    a[i] = (uint64_t)s;
    carry = s >> 64;
  }
}

// a -= m * b; assumes no net underflow beyond one fixup by caller
static void bn_submul(uint64_t *a, const uint64_t *b, uint64_t m, int W) {
  u128 borrow = 0;
  for (int i = 0; i < W; ++i) {
    u128 prod = (u128)b[i] * m + borrow;
    uint64_t lo = (uint64_t)prod;
    borrow = prod >> 64;
    if (a[i] < lo) borrow += 1;
    a[i] -= lo;
  }
}

static uint64_t bn_mod_u64(const uint64_t *a, int W, uint64_t m) {
  u128 rem = 0;
  for (int i = W - 1; i >= 0; --i) {
    rem = ((rem << 64) | a[i]) % m;
  }
  return (uint64_t)rem;
}

static long double bn_to_ld(const uint64_t *a, int W) {
  long double v = 0.0L;
  for (int i = W - 1; i >= 0; --i) v = v * 18446744073709551616.0L + a[i];
  return v;
}

static inline uint64_t mulmod_u64(uint64_t a, uint64_t b, uint64_t m) {
  return (uint64_t)(((u128)a * b) % m);
}

static uint64_t powmod_u64(uint64_t a, uint64_t e, uint64_t m) {
  uint64_t r = 1 % m;
  a %= m;
  while (e) {
    if (e & 1) r = mulmod_u64(r, a, m);
    a = mulmod_u64(a, a, m);
    e >>= 1;
  }
  return r;
}

// balanced CRT of one coefficient: writes |x| into mag (W words), returns
// sign in {-1, 0, +1}.  scratch must hold W+1 words.
static int crt_coeff(const CrtCtx *c, const uint32_t *res, int64_t stride,
                     uint64_t *mag, uint64_t *scratch) {
  const int W = c->W;
  bn_zero(mag, W);
  long double f = 0.0L;
  for (int i = 0; i < c->L; ++i) {
    uint64_t r = res[(int64_t)i * stride];
    uint64_t t = mulmod_u64(r, c->inv[i], c->qs[i]);
    if (t) bn_addmul(mag, c->Qi + (int64_t)i * W, t, W);
    f += (long double)t / (long double)c->qs[i];
  }
  // subtract k*Q
  uint64_t k = (uint64_t)f;  // floor; f < L so fits easily
  if (k) bn_submul(mag, c->Q, k, W);
  // fixup, wrap first: if the float estimate overshot, mag wrapped negative.
  // Values are < (L+1)*Q < 2^hdroom * Q with >= 65 headroom bits in W, so a
  // wrapped value has its top word >= 2^63 and a real value never does.
  while (mag[W - 1] >> 63) bn_add(mag, c->Q, W);
  while (bn_cmp(mag, c->Q, W) >= 0) bn_sub(mag, c->Q, W);

  // balanced reduce: x > Q/2  ->  x - Q  (negative)
  int sign = 1;
  bool zero = true;
  for (int i = 0; i < W; ++i) if (mag[i]) { zero = false; break; }
  if (zero) return 0;
  if (bn_cmp(mag, c->Qhalf, W) > 0) {
    // mag = Q - mag, sign = -1
    memcpy(scratch, c->Q, 8 * W);
    bn_sub(scratch, mag, W);
    memcpy(mag, scratch, 8 * W);
    sign = -1;
  }
  return sign;
}

}  // namespace

extern "C" {

// Create a CRT context for a prime set.  qs: L primes (each < 2^32 in
// practice; u64 for headroom).  Returns an opaque handle.
void *crt_init(const uint64_t *qs, int L) {
  CrtCtx *c = new CrtCtx;
  c->L = L;
  // bits(Q) <= sum bits(q_i); headroom: +2 words for L*Q accumulation + sign
  long bits = 0;
  for (int i = 0; i < L; ++i) {
    long b = 64 - __builtin_clzll(qs[i] | 1);
    bits += b;
  }
  c->W = (int)((bits + 64 * 2 + 63) / 64) + 1;
  const int W = c->W;
  c->qs = new uint64_t[L];
  c->inv = new uint64_t[L];
  c->Qi = new uint64_t[(int64_t)L * W];
  c->Q = new uint64_t[W];
  c->Qhalf = new uint64_t[W];
  memcpy(c->qs, qs, 8 * L);
  // Q = prod qs
  bn_zero(c->Q, W);
  c->Q[0] = 1;
  for (int i = 0; i < L; ++i) {
    u128 carry = 0;
    for (int w = 0; w < W; ++w) {
      u128 s = (u128)c->Q[w] * qs[i] + carry;
      c->Q[w] = (uint64_t)s;
      carry = s >> 64;
    }
  }
  // Qi = Q / q_i (exact short division), inv_i = Qi^{-1} mod q_i
  for (int i = 0; i < L; ++i) {
    uint64_t *Qi = c->Qi + (int64_t)i * W;
    u128 rem = 0;
    for (int w = W - 1; w >= 0; --w) {
      u128 cur = (rem << 64) | c->Q[w];
      Qi[w] = (uint64_t)(cur / qs[i]);
      rem = cur % qs[i];
    }
    uint64_t qi_mod = bn_mod_u64(Qi, W, qs[i]);
    c->inv[i] = powmod_u64(qi_mod, qs[i] - 2, qs[i]);  // q_i prime
  }
  memcpy(c->Qhalf, c->Q, 8 * W);
  // Qhalf = Q >> 1
  for (int w = 0; w < W; ++w) {
    c->Qhalf[w] = (c->Qhalf[w] >> 1) |
                  (w + 1 < W ? (c->Qhalf[w + 1] << 63) : 0);
  }
  c->Qld = bn_to_ld(c->Q, W);
  return c;
}

void crt_free(void *h) {
  CrtCtx *c = (CrtCtx *)h;
  delete[] c->qs;
  delete[] c->inv;
  delete[] c->Qi;
  delete[] c->Q;
  delete[] c->Qhalf;
  delete c;
}

int crt_nwords(void *h) { return ((CrtCtx *)h)->W; }

// Balanced CRT value mod `modulus`, non-negative representative in
// [0, modulus).  res: [L, N] row-major uint32 residues.
void crt_balanced_mod(void *h, const uint32_t *res, int64_t N,
                      uint64_t modulus, int64_t *out) {
  CrtCtx *c = (CrtCtx *)h;
  const int W = c->W;
#pragma omp parallel
  {
    uint64_t *mag = (uint64_t *)malloc(8 * (2 * W + 1));
    uint64_t *scratch = mag + W;
#pragma omp for schedule(static)
    for (int64_t j = 0; j < N; ++j) {
      int sign = crt_coeff(c, res + j, N, mag, scratch);
      uint64_t r = sign ? bn_mod_u64(mag, W, modulus) : 0;
      int64_t v = (sign < 0) ? (int64_t)((modulus - r) % modulus) : (int64_t)r;
      out[j] = v;
    }
    free(mag);
  }
}

// Balanced CRT value as sign (int8) + W little-endian u64 limbs per coeff.
void crt_balanced_limbs(void *h, const uint32_t *res, int64_t N,
                        int8_t *signs, uint64_t *limbs) {
  CrtCtx *c = (CrtCtx *)h;
  const int W = c->W;
#pragma omp parallel
  {
    uint64_t *scratch = (uint64_t *)malloc(8 * (W + 1));
#pragma omp for schedule(static)
    for (int64_t j = 0; j < N; ++j) {
      uint64_t *mag = limbs + j * W;
      signs[j] = (int8_t)crt_coeff(c, res + j, N, mag, scratch);
    }
    free(scratch);
  }
}

// Balanced CRT value as mantissa * 2^exp (frexp form; exact top 64 bits).
void crt_balanced_double(void *h, const uint32_t *res, int64_t N,
                         double *mant, int32_t *exp2) {
  CrtCtx *c = (CrtCtx *)h;
  const int W = c->W;
#pragma omp parallel
  {
  uint64_t *mag = (uint64_t *)malloc(8 * (2 * W + 1));
  uint64_t *scratch = mag + W;
#pragma omp for schedule(static)
  for (int64_t j = 0; j < N; ++j) {
    int sign = crt_coeff(c, res + j, N, mag, scratch);
    if (!sign) { mant[j] = 0.0; exp2[j] = 0; continue; }
    int top = W - 1;
    while (top > 0 && !mag[top]) --top;
    long double v = (long double)mag[top];
    if (top > 0) v = v * 18446744073709551616.0L + (long double)mag[top - 1];
    int e = (top > 0 ? (top - 1) : 0) * 64;
    if (top == 0) v = (long double)mag[0];
    int ex;
    long double frac = frexpl(v, &ex);
    mant[j] = (double)(sign * frac);
    exp2[j] = ex + e;
  }
  free(mag);
  }
}

// Full rawModSwitch rounding for one part, POWER basis (pow2-m fast path;
// reference Ctxt::rawModSwitch rounding, same math as recryption.py):
//   c  = balanced CRT value;  (X, Y) = divmod(c*q, Q)  [floor semantics],
//   Y balanced (Y > Q/2 -> Y -= Q, X += 1);
//   delta = balanced_{p2r}(Y * Qinv mod p2r);  out = balanced_q(X + delta).
void crt_mod_switch(void *h, const uint32_t *res, int64_t N, uint64_t q,
                    uint64_t p2r, int64_t *out) {
  CrtCtx *c = (CrtCtx *)h;
  const int W = c->W;
  // Qinv = Q^{-1} mod p2r via extended Euclid (p2r is a prime power)
  uint64_t Qinv;
  {
    int64_t a = (int64_t)bn_mod_u64(c->Q, W, p2r), m = (int64_t)p2r;
    int64_t t0 = 0, t1 = 1, r0 = m, r1 = a;
    while (r1) {
      int64_t qq = r0 / r1;
      int64_t tmp = r0 - qq * r1; r0 = r1; r1 = tmp;
      tmp = t0 - qq * t1; t0 = t1; t1 = tmp;
    }
    Qinv = (uint64_t)((t0 % m + m) % m);
  }
  const uint64_t qmodp = bn_mod_u64(c->Q, W, p2r) % p2r;
#pragma omp parallel
  {
  uint64_t *mag = (uint64_t *)malloc(8 * (3 * W + 3));
  uint64_t *scratch = mag + W;
  uint64_t *U = scratch + W + 1;  // W+1 words for mag*q
#pragma omp for schedule(static)
  for (int64_t j = 0; j < N; ++j) {
    int sign = crt_coeff(c, res + j, N, mag, scratch);
    if (!sign) { out[j] = 0; continue; }
    // U = mag * q;  nonneg divmod: U = X0*Q + Y0, 0 <= Y0 < Q
    memset(U, 0, 8 * (W + 1));
    u128 carry = 0;
    for (int w = 0; w < W; ++w) {
      u128 s = (u128)mag[w] * q + carry;
      U[w] = (uint64_t)s;
      carry = s >> 64;
    }
    U[W] = (uint64_t)carry;
    // X0 ~ U / Q via long double (mag <= Q/2 so X0 <= q/2 fits u64), then
    // exact fixup by add/subtract of Q on the W+1-word remainder.
    long double Uld = bn_to_ld(U, W + 1);
    long double est = Uld / c->Qld;
    uint64_t X0 = (est < 1.0L) ? 0 : (uint64_t)est;
    {  // U -= X0 * Q over W+1 words
      u128 borrow = 0;
      for (int w = 0; w < W + 1; ++w) {
        uint64_t qw = (w < W) ? c->Q[w] : 0;
        u128 prod = (u128)qw * X0 + borrow;
        uint64_t lo = (uint64_t)prod;
        borrow = prod >> 64;
        if (U[w] < lo) borrow += 1;
        U[w] -= lo;
      }
    }
    // overshoot -> wrapped negative (top word has the sign bit): add Q back
    while (U[W] >> 63) {
      u128 c2 = 0;
      for (int w = 0; w < W + 1; ++w) {
        uint64_t qw = (w < W) ? c->Q[w] : 0;
        u128 s = (u128)U[w] + qw + (uint64_t)c2;
        U[w] = (uint64_t)s;
        c2 = s >> 64;
      }
      X0 -= 1;
    }
    // undershoot -> subtract Q until U < Q
    while (U[W] > 0 || bn_cmp(U, c->Q, W) >= 0) {
      u128 borrow = 0;
      for (int w = 0; w < W + 1; ++w) {
        uint64_t qw = (w < W) ? c->Q[w] : 0;
        u128 d = (u128)U[w] - qw - (uint64_t)borrow;
        U[w] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
      }
      X0 += 1;
    }
    // floor divmod of the SIGNED value c*q = sign * (X0*Q + Y0), Y0 = U:
    //   sign>0:           X = X0,      Y = Y0
    //   sign<0, Y0 == 0:  X = -X0,     Y = 0
    //   sign<0, Y0 > 0:   X = -X0-1,   Y = Q - Y0
    int64_t X;
    uint64_t ymod;   // Y mod p2r  (Y in [0, Q))
    bool ybig;       // Y > Q/2 ?
    bool yzero = true;
    for (int w = 0; w < W; ++w) if (U[w]) { yzero = false; break; }
    if (sign > 0) {
      X = (int64_t)X0;
      ymod = bn_mod_u64(U, W, p2r);
      ybig = bn_cmp(U, c->Qhalf, W) > 0;
    } else if (yzero) {
      X = -(int64_t)X0;
      ymod = 0;
      ybig = false;
    } else {
      X = -(int64_t)X0 - 1;
      uint64_t um = bn_mod_u64(U, W, p2r);
      ymod = (qmodp + p2r - um % p2r) % p2r;
      // Y = Q - Y0 > Q/2  <=>  Y0 < Q - Q/2 = ceil(Q/2)  <=>  Y0 <= Q/2
      ybig = bn_cmp(U, c->Qhalf, W) <= 0;
    }
    if (ybig) {  // Y -= Q, X += 1
      ymod = (ymod + p2r - qmodp) % p2r;
      X += 1;
    }
    uint64_t delta_u = mulmod_u64(ymod, Qinv, p2r);
    int64_t delta = (int64_t)delta_u;
    if (delta_u > p2r / 2) delta -= (int64_t)p2r;
    int64_t x = X + delta;
    int64_t qm = (int64_t)q;
    // mirror recryption.py exactly: balanced_int only when |x| > q//2
    if (x > qm / 2 || x < -(qm / 2)) {
      x = ((x % qm) + qm) % qm;
      if (x > qm / 2) x -= qm;
    }
    out[j] = x;
  }
  free(mag);
  }
}

}  // extern "C"
