/* BN254 (alt_bn128) native kernels: G1 add/mul/MSM, G2 subgroup check, and
 * the optimal-ate pairing product check.
 *
 * Replaces the role of py_ecc in the reference (util/ec.py:120-199,
 * ecc_circuit.py): the ecc circuit's witness/verify hot path (precompiles
 * 0x06-0x08) runs here instead of host Python.  The algorithm mirrors
 * ops/ecc/bn254.py (same Miller loop over the 6t+2 ate count, same naive
 * final exponentiation, same (0,0)=infinity convention) so verdicts are
 * bit-identical; the field layer is 4x64-limb Montgomery arithmetic with
 * the Fp2/Fp6/Fp12 tower (w^6 = 9+u) rather than the Python degree-12
 * polynomial representation.
 *
 * API (all byte buffers 32-byte big-endian; (0,0) encodes infinity):
 *   zkevm_bn254_g1_add(ax, ay, bx, by, ox, oy)      -> 1 finite / 0 inf
 *   zkevm_bn254_g1_mul(px, py, k, ox, oy)           -> 1 finite / 0 inf
 *   zkevm_bn254_g1_msm(xs, ys, ks, n, ox, oy)       -> sum k_i*P_i
 *   zkevm_bn254_g2_subgroup_check(x0, x1, y0, y1)   -> 1 iff order-r
 *   zkevm_bn254_pairing_check(g1s, g2s, n)          -> 1 iff prod e() == 1
 */
#include <stdint.h>
#include <string.h>
#include <stddef.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

typedef struct { u64 v[4]; } bfe; /* little-endian 64-bit limbs */

static const bfe FP_P = {{0x3C208C16D87CFD47ULL, 0x97816A916871CA8DULL,
                          0xB85045B68181585DULL, 0x30644E72E131A029ULL}};
#define N0INV 0x87D20782E4866389ULL
static const bfe FP_R2 = {{0xF32CFC5B538AFA89ULL, 0xB5E71911D44501FBULL,
                           0x47AB1EFF0A417FF6ULL, 0x06D89F71CAB8351FULL}};
static const bfe FP_ONE = {{0xD35D438DC58F0D9DULL, 0x0A78EB28F5C70B3DULL,
                            0x666EA36F7879462CULL, 0x0E0A77C19A07DF2FULL}};
static const bfe FP_NINE = {{0xF60647CE410D7FF7ULL, 0x2F3D6F4DD31BD011ULL,
                             0x2943337E3940C6D1ULL, 0x1D9598E8A7E39857ULL}};
/* group order r (plain, for the subgroup-check scalar) */
static const u64 ORDER_R[4] = {0x43E1F593F0000001ULL, 0x2833E84879B97091ULL,
                               0xB85045B68181585DULL, 0x30644E72E131A029ULL};
/* ate loop count 6t+2 = 29793968203157093288 (65 bits; loop runs bits 63..0
 * as in ops/ecc/bn254.py _miller_loop) */
#define ATE_LO 0x9D797039BE763BA8ULL
#define ATE_HI 0x1ULL
/* field modulus p as a plain scalar (for the Frobenius pow) */
static const u64 P_SCALAR[4] = {0x3C208C16D87CFD47ULL, 0x97816A916871CA8DULL,
                                0xB85045B68181585DULL, 0x30644E72E131A029ULL};
/* (p^12 - 1) / r, big-endian bytes — naive final exponentiation */
static const uint8_t FINAL_EXP[349] = {
0x2F,0x4B,0x6D,0xC9,0x70,0x20,0xFD,0xDA,0xDF,0x10,0x7D,0x20,0xBC,0x84,0x2D,0x43,
0xBF,0x63,0x69,0xB1,0xFF,0x6A,0x1C,0x71,0x01,0x5F,0x3F,0x7B,0xE2,0xE1,0xE3,0x0A,
0x73,0xBB,0x94,0xFE,0xC0,0xDA,0xF1,0x54,0x66,0xB2,0x38,0x3A,0x5D,0x3E,0xC3,0xD1,
0x5A,0xD5,0x24,0xD8,0xF7,0x0C,0x54,0xEF,0xEE,0x1B,0xD8,0xC3,0xB2,0x13,0x77,0xE5,
0x63,0xA0,0x9A,0x1B,0x70,0x58,0x87,0xE7,0x2E,0xCE,0xAD,0xDE,0xA3,0x79,0x03,0x64,
0xA6,0x1F,0x67,0x6B,0xAA,0xF9,0x77,0x87,0x0E,0x88,0xD5,0xC6,0xC8,0xFE,0xF0,0x78,
0x13,0x61,0xE4,0x43,0xAE,0x77,0xF5,0xB6,0x3A,0x2A,0x22,0x64,0x48,0x7F,0x29,0x40,
0xA8,0xB1,0xDD,0xB3,0xD1,0x50,0x62,0xCD,0x0F,0xB2,0x01,0x5D,0xFC,0x66,0x68,0x44,
0x9A,0xED,0x3C,0xC4,0x8A,0x82,0xD0,0xD6,0x02,0xD2,0x68,0xC7,0xDA,0xAB,0x6A,0x41,
0x29,0x4C,0x0C,0xC4,0xEB,0xE5,0x66,0x45,0x68,0xDF,0xC5,0x0E,0x16,0x48,0xA4,0x5A,
0x4A,0x1E,0x3A,0x51,0x95,0x84,0x6A,0x3E,0xD0,0x11,0xA3,0x37,0xA0,0x20,0x88,0xEC,
0x80,0xE0,0xEB,0xAE,0x87,0x55,0xCF,0xE1,0x07,0xAC,0xF3,0xAA,0xFB,0x40,0x49,0x4E,
0x40,0x6F,0x80,0x42,0x16,0xBB,0x10,0xCF,0x43,0x0B,0x0F,0x37,0x85,0x6B,0x42,0xDB,
0x8D,0xC5,0x51,0x47,0x24,0xEE,0x93,0xDF,0xB1,0x08,0x26,0xF0,0xDD,0x4A,0x03,0x64,
0xB9,0x58,0x02,0x91,0xD2,0xCD,0x65,0x66,0x48,0x14,0xFD,0xE3,0x7C,0xA8,0x0B,0xB4,
0xEA,0x44,0xEA,0xCC,0x5E,0x64,0x1B,0xBA,0xDF,0x42,0x3F,0x9A,0x2C,0xBF,0x81,0x3B,
0x8D,0x14,0x5D,0xA9,0x00,0x29,0xBA,0xEE,0x7D,0xDA,0xDD,0xA7,0x1C,0x7F,0x38,0x11,
0xC4,0x10,0x52,0x62,0x94,0x5B,0xBA,0x16,0x68,0xC3,0xBE,0x69,0xA3,0xC2,0x30,0x97,
0x4D,0x83,0x56,0x18,0x41,0xD7,0x66,0xF9,0xC9,0xD5,0x70,0xBB,0x7F,0xBE,0x04,0xC7,
0xE8,0xA6,0xC3,0xC7,0x60,0xC0,0xDE,0x81,0xDE,0xF3,0x56,0x92,0xDA,0x36,0x11,0x02,
0xB6,0xB9,0xB2,0xB9,0x18,0x83,0x7F,0xA9,0x78,0x96,0xE8,0x4A,0xBB,0x40,0xA4,0xEF,
0xB7,0xE5,0x45,0x23,0xA4,0x86,0x96,0x4B,0x64,0xCA,0x86,0xF1,0x20};

/* ---------------- base field ---------------- */

static int bfe_is_zero(const bfe *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static int bfe_cmp(const bfe *a, const bfe *b) {
    for (int i = 3; i >= 0; i--) {
        if (a->v[i] < b->v[i]) return -1;
        if (a->v[i] > b->v[i]) return 1;
    }
    return 0;
}

static u64 bfe_add_raw(bfe *r, const bfe *a, const bfe *b) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        c += (u128)a->v[i] + b->v[i];
        r->v[i] = (u64)c;
        c >>= 64;
    }
    return (u64)c;
}

static u64 bfe_sub_raw(bfe *r, const bfe *a, const bfe *b) {
    u128 br = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - br;
        r->v[i] = (u64)d;
        br = (d >> 64) & 1;
    }
    return (u64)br;
}

static void fp_add(bfe *r, const bfe *a, const bfe *b) {
    bfe t;
    u64 c = bfe_add_raw(&t, a, b);
    if (c || bfe_cmp(&t, &FP_P) >= 0)
        bfe_sub_raw(&t, &t, &FP_P);
    *r = t;
}

static void fp_sub(bfe *r, const bfe *a, const bfe *b) {
    bfe t;
    if (bfe_sub_raw(&t, a, b))
        bfe_add_raw(&t, &t, &FP_P);
    *r = t;
}

static void fp_neg(bfe *r, const bfe *a) {
    if (bfe_is_zero(a)) { *r = *a; return; }
    bfe_sub_raw(r, &FP_P, a);
}

/* Montgomery CIOS multiplication: r = a*b*R^-1 mod p */
static void fp_mul(bfe *r, const bfe *a, const bfe *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            c += (u128)t[j] + (u128)a->v[i] * b->v[j];
            t[j] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[4] = (u64)c;
        t[5] = (u64)(c >> 64);
        u64 m = t[0] * N0INV;
        c = (u128)t[0] + (u128)m * FP_P.v[0];
        c >>= 64;
        for (int j = 1; j < 4; j++) {
            c += (u128)t[j] + (u128)m * FP_P.v[j];
            t[j - 1] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[3] = (u64)c;
        t[4] = t[5] + (u64)(c >> 64);
        t[5] = 0;
    }
    bfe out = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || bfe_cmp(&out, &FP_P) >= 0)
        bfe_sub_raw(&out, &out, &FP_P);
    *r = out;
}

static void fp_sqr(bfe *r, const bfe *a) { fp_mul(r, a, a); }

static int bfe_is_one(const bfe *a) {
    return a->v[0] == 1 && (a->v[1] | a->v[2] | a->v[3]) == 0;
}

static void bfe_shr1(bfe *a, u64 top) {
    for (int i = 0; i < 3; i++)
        a->v[i] = (a->v[i] >> 1) | (a->v[i + 1] << 63);
    a->v[3] = (a->v[3] >> 1) | (top << 63);
}

/* plain-domain modular inverse via binary extended gcd */
static void fp_inv_plain(bfe *r, const bfe *a) {
    if (bfe_is_zero(a)) { *r = *a; return; }
    bfe u = *a, v = FP_P;
    bfe x1 = {{1, 0, 0, 0}}, x2 = {{0, 0, 0, 0}};
    while (!bfe_is_one(&u) && !bfe_is_one(&v)) {
        while (!(u.v[0] & 1)) {
            bfe_shr1(&u, 0);
            if (x1.v[0] & 1) {
                u64 c = bfe_add_raw(&x1, &x1, &FP_P);
                bfe_shr1(&x1, c);
            } else {
                bfe_shr1(&x1, 0);
            }
        }
        while (!(v.v[0] & 1)) {
            bfe_shr1(&v, 0);
            if (x2.v[0] & 1) {
                u64 c = bfe_add_raw(&x2, &x2, &FP_P);
                bfe_shr1(&x2, c);
            } else {
                bfe_shr1(&x2, 0);
            }
        }
        if (bfe_cmp(&u, &v) >= 0) {
            bfe_sub_raw(&u, &u, &v);
            fp_sub(&x1, &x1, &x2);
        } else {
            bfe_sub_raw(&v, &v, &u);
            fp_sub(&x2, &x2, &x1);
        }
    }
    *r = bfe_is_one(&u) ? x1 : x2;
}

/* Montgomery-domain inverse */
static void fp_inv(bfe *r, const bfe *a) {
    static const bfe ONE_PLAIN = {{1, 0, 0, 0}};
    bfe plain, inv;
    fp_mul(&plain, a, &ONE_PLAIN); /* from Montgomery */
    fp_inv_plain(&inv, &plain);
    fp_mul(r, &inv, &FP_R2); /* to Montgomery */
}

static void fp_from_bytes(bfe *r, const uint8_t b[32]) {
    bfe t;
    for (int i = 0; i < 4; i++) {
        u64 w = 0;
        for (int j = 0; j < 8; j++)
            w = (w << 8) | b[(3 - i) * 8 + j];
        t.v[i] = w;
    }
    while (bfe_cmp(&t, &FP_P) >= 0)
        bfe_sub_raw(&t, &t, &FP_P);
    fp_mul(r, &t, &FP_R2);
}

static void fp_to_bytes(uint8_t b[32], const bfe *a) {
    static const bfe ONE_PLAIN = {{1, 0, 0, 0}};
    bfe t;
    fp_mul(&t, a, &ONE_PLAIN);
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 8; j++)
            b[(3 - i) * 8 + j] = (uint8_t)(t.v[i] >> (8 * (7 - j)));
}

static void scalar_from_bytes(u64 k[4], const uint8_t b[32]) {
    for (int i = 0; i < 4; i++) {
        u64 w = 0;
        for (int j = 0; j < 8; j++)
            w = (w << 8) | b[(3 - i) * 8 + j];
        k[i] = w;
    }
}

/* ---------------- Fp2 = Fp[u]/(u^2+1) ---------------- */

typedef struct { bfe c0, c1; } fp2;

static void fp2_add(fp2 *r, const fp2 *a, const fp2 *b) {
    fp_add(&r->c0, &a->c0, &b->c0);
    fp_add(&r->c1, &a->c1, &b->c1);
}

static void fp2_sub(fp2 *r, const fp2 *a, const fp2 *b) {
    fp_sub(&r->c0, &a->c0, &b->c0);
    fp_sub(&r->c1, &a->c1, &b->c1);
}

static void fp2_neg(fp2 *r, const fp2 *a) {
    fp_neg(&r->c0, &a->c0);
    fp_neg(&r->c1, &a->c1);
}

static void fp2_mul(fp2 *r, const fp2 *a, const fp2 *b) {
    bfe t0, t1, s0, s1, m;
    fp_mul(&t0, &a->c0, &b->c0);
    fp_mul(&t1, &a->c1, &b->c1);
    fp_add(&s0, &a->c0, &a->c1);
    fp_add(&s1, &b->c0, &b->c1);
    fp_mul(&m, &s0, &s1);
    fp_sub(&r->c0, &t0, &t1);       /* a0b0 - a1b1 */
    fp_sub(&m, &m, &t0);
    fp_sub(&r->c1, &m, &t1);        /* a0b1 + a1b0 */
}

static void fp2_sqr(fp2 *r, const fp2 *a) { fp2_mul(r, a, a); }

static void fp2_inv(fp2 *r, const fp2 *a) {
    bfe n0, n1, n, ninv;
    fp_sqr(&n0, &a->c0);
    fp_sqr(&n1, &a->c1);
    fp_add(&n, &n0, &n1);
    fp_inv(&ninv, &n);
    fp_mul(&r->c0, &a->c0, &ninv);
    bfe t;
    fp_mul(&t, &a->c1, &ninv);
    fp_neg(&r->c1, &t);
}

static int fp2_is_zero(const fp2 *a) {
    return bfe_is_zero(&a->c0) && bfe_is_zero(&a->c1);
}

static int fp2_eq(const fp2 *a, const fp2 *b) {
    return bfe_cmp(&a->c0, &b->c0) == 0 && bfe_cmp(&a->c1, &b->c1) == 0;
}

/* multiply by xi = 9 + u */
static void fp2_mul_xi(fp2 *r, const fp2 *a) {
    bfe n0, n1, t;
    fp_mul(&n0, &a->c0, &FP_NINE);
    fp_mul(&n1, &a->c1, &FP_NINE);
    fp_sub(&t, &n0, &a->c1);   /* 9a0 - a1 */
    fp_add(&r->c1, &n1, &a->c0); /* 9a1 + a0 */
    r->c0 = t;
}

/* ---------------- Fp6 = Fp2[v]/(v^3 - xi) ---------------- */

typedef struct { fp2 c0, c1, c2; } fp6;

static void fp6_add(fp6 *r, const fp6 *a, const fp6 *b) {
    fp2_add(&r->c0, &a->c0, &b->c0);
    fp2_add(&r->c1, &a->c1, &b->c1);
    fp2_add(&r->c2, &a->c2, &b->c2);
}

static void fp6_sub(fp6 *r, const fp6 *a, const fp6 *b) {
    fp2_sub(&r->c0, &a->c0, &b->c0);
    fp2_sub(&r->c1, &a->c1, &b->c1);
    fp2_sub(&r->c2, &a->c2, &b->c2);
}

static void fp6_neg(fp6 *r, const fp6 *a) {
    fp2_neg(&r->c0, &a->c0);
    fp2_neg(&r->c1, &a->c1);
    fp2_neg(&r->c2, &a->c2);
}

static void fp6_mul(fp6 *r, const fp6 *a, const fp6 *b) {
    fp2 t00, t01, t02, t10, t11, t12, t20, t21, t22, s, x;
    fp2_mul(&t00, &a->c0, &b->c0);
    fp2_mul(&t01, &a->c0, &b->c1);
    fp2_mul(&t02, &a->c0, &b->c2);
    fp2_mul(&t10, &a->c1, &b->c0);
    fp2_mul(&t11, &a->c1, &b->c1);
    fp2_mul(&t12, &a->c1, &b->c2);
    fp2_mul(&t20, &a->c2, &b->c0);
    fp2_mul(&t21, &a->c2, &b->c1);
    fp2_mul(&t22, &a->c2, &b->c2);
    fp2 out0, out1, out2;
    fp2_add(&s, &t12, &t21);
    fp2_mul_xi(&x, &s);
    fp2_add(&out0, &t00, &x);            /* a0b0 + xi(a1b2+a2b1) */
    fp2_mul_xi(&x, &t22);
    fp2_add(&s, &t01, &t10);
    fp2_add(&out1, &s, &x);              /* a0b1 + a1b0 + xi a2b2 */
    fp2_add(&s, &t02, &t11);
    fp2_add(&out2, &s, &t20);            /* a0b2 + a1b1 + a2b0 */
    r->c0 = out0; r->c1 = out1; r->c2 = out2;
}

static void fp6_inv(fp6 *r, const fp6 *a) {
    fp2 c0, c1, c2, t, x, s;
    fp2_sqr(&c0, &a->c0);
    fp2_mul(&t, &a->c1, &a->c2);
    fp2_mul_xi(&x, &t);
    fp2_sub(&c0, &c0, &x);               /* a0^2 - xi a1 a2 */
    fp2_sqr(&t, &a->c2);
    fp2_mul_xi(&x, &t);
    fp2_mul(&t, &a->c0, &a->c1);
    fp2_sub(&c1, &x, &t);                /* xi a2^2 - a0 a1 */
    fp2_sqr(&t, &a->c1);
    fp2_mul(&x, &a->c0, &a->c2);
    fp2_sub(&c2, &t, &x);                /* a1^2 - a0 a2 */
    fp2_mul(&t, &a->c1, &c2);
    fp2_mul(&x, &a->c2, &c1);
    fp2_add(&s, &t, &x);
    fp2_mul_xi(&x, &s);
    fp2_mul(&t, &a->c0, &c0);
    fp2_add(&s, &t, &x);                 /* a0 c0 + xi(a1 c2 + a2 c1) */
    fp2 sinv;
    fp2_inv(&sinv, &s);
    fp2_mul(&r->c0, &c0, &sinv);
    fp2_mul(&r->c1, &c1, &sinv);
    fp2_mul(&r->c2, &c2, &sinv);
}

/* multiply by v: (c0,c1,c2) -> (xi c2, c0, c1) */
static void fp6_mul_v(fp6 *r, const fp6 *a) {
    fp2 t;
    fp2_mul_xi(&t, &a->c2);
    r->c2 = a->c1;
    r->c1 = a->c0;
    r->c0 = t;
}

static int fp6_is_zero(const fp6 *a) {
    return fp2_is_zero(&a->c0) && fp2_is_zero(&a->c1) && fp2_is_zero(&a->c2);
}

static int fp6_eq(const fp6 *a, const fp6 *b) {
    return fp2_eq(&a->c0, &b->c0) && fp2_eq(&a->c1, &b->c1) &&
           fp2_eq(&a->c2, &b->c2);
}

/* ---------------- Fp12 = Fp6[w]/(w^2 - v) ---------------- */

typedef struct { fp6 c0, c1; } fp12;

static void fp12_one(fp12 *r) {
    memset(r, 0, sizeof(*r));
    r->c0.c0.c0 = FP_ONE;
}

static void fp12_mul(fp12 *r, const fp12 *a, const fp12 *b) {
    fp6 t0, t1, s0, s1, m, x;
    fp6_mul(&t0, &a->c0, &b->c0);
    fp6_mul(&t1, &a->c1, &b->c1);
    fp6_add(&s0, &a->c0, &a->c1);
    fp6_add(&s1, &b->c0, &b->c1);
    fp6_mul(&m, &s0, &s1);
    fp6_mul_v(&x, &t1);
    fp6_add(&r->c0, &t0, &x);            /* a0b0 + v a1b1 */
    fp6_sub(&m, &m, &t0);
    fp6_sub(&r->c1, &m, &t1);            /* a0b1 + a1b0 */
}

static void fp12_sqr(fp12 *r, const fp12 *a) { fp12_mul(r, a, a); }

static void fp12_sub(fp12 *r, const fp12 *a, const fp12 *b) {
    fp6_sub(&r->c0, &a->c0, &b->c0);
    fp6_sub(&r->c1, &a->c1, &b->c1);
}

static void fp12_add(fp12 *r, const fp12 *a, const fp12 *b) {
    fp6_add(&r->c0, &a->c0, &b->c0);
    fp6_add(&r->c1, &a->c1, &b->c1);
}

static void fp12_neg(fp12 *r, const fp12 *a) {
    fp6_neg(&r->c0, &a->c0);
    fp6_neg(&r->c1, &a->c1);
}

static void fp12_inv(fp12 *r, const fp12 *a) {
    fp6 t0, t1, x, d, dinv;
    fp6_mul(&t0, &a->c0, &a->c0);
    fp6_mul(&t1, &a->c1, &a->c1);
    fp6_mul_v(&x, &t1);
    fp6_sub(&d, &t0, &x);                /* a0^2 - v a1^2 */
    fp6_inv(&dinv, &d);
    fp6_mul(&r->c0, &a->c0, &dinv);
    fp6_mul(&x, &a->c1, &dinv);
    fp6_neg(&r->c1, &x);
}

static int fp12_is_zero(const fp12 *a) {
    return fp6_is_zero(&a->c0) && fp6_is_zero(&a->c1);
}

static int fp12_eq(const fp12 *a, const fp12 *b) {
    return fp6_eq(&a->c0, &b->c0) && fp6_eq(&a->c1, &b->c1);
}

static int fp12_is_one(const fp12 *a) {
    fp12 one;
    fp12_one(&one);
    return fp12_eq(a, &one);
}

/* r = a^e, e as 4x64 little-endian limbs (square-and-multiply, MSB first) */
static void fp12_pow_u256(fp12 *r, const fp12 *a, const u64 e[4]) {
    fp12 acc;
    fp12_one(&acc);
    int started = 0;
    for (int i = 3; i >= 0; i--) {
        for (int b = 63; b >= 0; b--) {
            if (started)
                fp12_sqr(&acc, &acc);
            if ((e[i] >> b) & 1) {
                if (started)
                    fp12_mul(&acc, &acc, a);
                else {
                    acc = *a;
                    started = 1;
                }
            }
        }
    }
    *r = acc;
}

static void fp12_pow_bytes(fp12 *r, const fp12 *a, const uint8_t *e, size_t n) {
    fp12 acc;
    fp12_one(&acc);
    int started = 0;
    for (size_t i = 0; i < n; i++) {
        for (int b = 7; b >= 0; b--) {
            if (started)
                fp12_sqr(&acc, &acc);
            if ((e[i] >> b) & 1) {
                if (started)
                    fp12_mul(&acc, &acc, a);
                else {
                    acc = *a;
                    started = 1;
                }
            }
        }
    }
    *r = acc;
}

/* ---------------- G1 (E/Fp, y^2 = x^3 + 3), Jacobian ---------------- */

typedef struct { bfe x, y, z; } g1j; /* z == 0 -> infinity */

static void g1j_set_inf(g1j *p) { memset(p, 0, sizeof(*p)); }

static int g1j_is_inf(const g1j *p) { return bfe_is_zero(&p->z); }

static void g1j_dbl(g1j *r, const g1j *p) {
    if (g1j_is_inf(p) || bfe_is_zero(&p->y)) { g1j_set_inf(r); return; }
    bfe a, b, c, d, e, f, t, x3, y3, z3;
    fp_sqr(&a, &p->x);                   /* A = X^2 */
    fp_sqr(&b, &p->y);                   /* B = Y^2 */
    fp_sqr(&c, &b);                      /* C = B^2 */
    fp_add(&t, &p->x, &b);
    fp_sqr(&t, &t);
    fp_sub(&t, &t, &a);
    fp_sub(&t, &t, &c);
    fp_add(&d, &t, &t);                  /* D = 2((X+B)^2 - A - C) */
    fp_add(&e, &a, &a);
    fp_add(&e, &e, &a);                  /* E = 3A */
    fp_sqr(&f, &e);                      /* F = E^2 */
    fp_sub(&x3, &f, &d);
    fp_sub(&x3, &x3, &d);                /* X3 = F - 2D */
    fp_sub(&t, &d, &x3);
    fp_mul(&y3, &e, &t);
    fp_add(&t, &c, &c);
    fp_add(&t, &t, &t);
    fp_add(&t, &t, &t);                  /* 8C */
    fp_sub(&y3, &y3, &t);                /* Y3 = E(D-X3) - 8C */
    fp_mul(&z3, &p->y, &p->z);
    fp_add(&z3, &z3, &z3);               /* Z3 = 2YZ */
    r->x = x3; r->y = y3; r->z = z3;
}

/* mixed addition: q affine (qz implied 1) */
static void g1j_add_affine(g1j *r, const g1j *p, const bfe *qx, const bfe *qy) {
    if (g1j_is_inf(p)) {
        r->x = *qx; r->y = *qy; r->z = FP_ONE;
        return;
    }
    bfe z2, u2, s2, h, rr, h2, h3, t, x3, y3, z3;
    fp_sqr(&z2, &p->z);
    fp_mul(&u2, qx, &z2);                /* U2 = qx Z^2 */
    fp_mul(&s2, qy, &z2);
    fp_mul(&s2, &s2, &p->z);             /* S2 = qy Z^3 */
    if (bfe_cmp(&u2, &p->x) == 0) {
        if (bfe_cmp(&s2, &p->y) == 0) { g1j_dbl(r, p); return; }
        g1j_set_inf(r);
        return;
    }
    fp_sub(&h, &u2, &p->x);              /* H = U2 - X1 */
    fp_sub(&rr, &s2, &p->y);             /* r = S2 - Y1 */
    fp_sqr(&h2, &h);
    fp_mul(&h3, &h2, &h);
    fp_mul(&t, &p->x, &h2);              /* V = X1 H^2 */
    fp_sqr(&x3, &rr);
    fp_sub(&x3, &x3, &h3);
    fp_sub(&x3, &x3, &t);
    fp_sub(&x3, &x3, &t);                /* X3 = r^2 - H^3 - 2V */
    fp_sub(&y3, &t, &x3);
    fp_mul(&y3, &rr, &y3);
    fp_mul(&t, &p->y, &h3);
    fp_sub(&y3, &y3, &t);                /* Y3 = r(V - X3) - Y1 H^3 */
    fp_mul(&z3, &p->z, &h);              /* Z3 = Z1 H */
    r->x = x3; r->y = y3; r->z = z3;
}

static int g1j_to_affine(bfe *x, bfe *y, const g1j *p) {
    if (g1j_is_inf(p)) return 0;
    bfe zi, zi2, zi3;
    fp_inv(&zi, &p->z);
    fp_sqr(&zi2, &zi);
    fp_mul(&zi3, &zi2, &zi);
    fp_mul(x, &p->x, &zi2);
    fp_mul(y, &p->y, &zi3);
    return 1;
}

/* r += k * (qx, qy) with q affine, k 4x64 LE scalar */
static void g1j_mul_acc(g1j *acc, const bfe *qx, const bfe *qy, const u64 k[4]) {
    g1j t;
    g1j_set_inf(&t);
    int started = 0;
    for (int i = 3; i >= 0; i--) {
        for (int b = 63; b >= 0; b--) {
            if (started)
                g1j_dbl(&t, &t);
            if ((k[i] >> b) & 1) {
                g1j_add_affine(&t, &t, qx, qy);
                started = 1;
            }
        }
    }
    /* acc += t (general Jacobian add via affine round-trip of t) */
    bfe tx, ty;
    if (g1j_to_affine(&tx, &ty, &t))
        g1j_add_affine(acc, acc, &tx, &ty);
}

/* ---------------- G2 (E'/Fp2, y^2 = x^3 + 3/(9+u)), Jacobian ------------- */

typedef struct { fp2 x, y, z; } g2j;

static void g2j_set_inf(g2j *p) { memset(p, 0, sizeof(*p)); }

static int g2j_is_inf(const g2j *p) { return fp2_is_zero(&p->z); }

static void g2j_dbl(g2j *r, const g2j *p) {
    if (g2j_is_inf(p) || fp2_is_zero(&p->y)) { g2j_set_inf(r); return; }
    fp2 a, b, c, d, e, f, t, x3, y3, z3;
    fp2_sqr(&a, &p->x);
    fp2_sqr(&b, &p->y);
    fp2_sqr(&c, &b);
    fp2_add(&t, &p->x, &b);
    fp2_sqr(&t, &t);
    fp2_sub(&t, &t, &a);
    fp2_sub(&t, &t, &c);
    fp2_add(&d, &t, &t);
    fp2_add(&e, &a, &a);
    fp2_add(&e, &e, &a);
    fp2_sqr(&f, &e);
    fp2_sub(&x3, &f, &d);
    fp2_sub(&x3, &x3, &d);
    fp2_sub(&t, &d, &x3);
    fp2_mul(&y3, &e, &t);
    fp2_add(&t, &c, &c);
    fp2_add(&t, &t, &t);
    fp2_add(&t, &t, &t);
    fp2_sub(&y3, &y3, &t);
    fp2_mul(&z3, &p->y, &p->z);
    fp2_add(&z3, &z3, &z3);
    r->x = x3; r->y = y3; r->z = z3;
}

static void g2j_add_affine(g2j *r, const g2j *p, const fp2 *qx, const fp2 *qy) {
    if (g2j_is_inf(p)) {
        r->x = *qx; r->y = *qy;
        memset(&r->z, 0, sizeof(r->z));
        r->z.c0 = FP_ONE;
        return;
    }
    fp2 z2, u2, s2, h, rr, h2, h3, t, x3, y3, z3;
    fp2_sqr(&z2, &p->z);
    fp2_mul(&u2, qx, &z2);
    fp2_mul(&s2, qy, &z2);
    fp2_mul(&s2, &s2, &p->z);
    if (fp2_eq(&u2, &p->x)) {
        if (fp2_eq(&s2, &p->y)) { g2j_dbl(r, p); return; }
        g2j_set_inf(r);
        return;
    }
    fp2_sub(&h, &u2, &p->x);
    fp2_sub(&rr, &s2, &p->y);
    fp2_sqr(&h2, &h);
    fp2_mul(&h3, &h2, &h);
    fp2_mul(&t, &p->x, &h2);
    fp2_sqr(&x3, &rr);
    fp2_sub(&x3, &x3, &h3);
    fp2_sub(&x3, &x3, &t);
    fp2_sub(&x3, &x3, &t);
    fp2_sub(&y3, &t, &x3);
    fp2_mul(&y3, &rr, &y3);
    fp2_mul(&t, &p->y, &h3);
    fp2_sub(&y3, &y3, &t);
    fp2_mul(&z3, &p->z, &h);
    r->x = x3; r->y = y3; r->z = z3;
}

/* ---------------- pairing (mirrors ops/ecc/bn254.py) ---------------- */

/* affine point on E(Fp12) */
typedef struct { fp12 x, y; int inf; } pt12;

/* generic affine add, as _fq12_add in the Python module */
static void pt12_add(pt12 *r, const pt12 *a, const pt12 *b) {
    if (a->inf) { *r = *b; return; }
    if (b->inf) { *r = *a; return; }
    fp12 lam, t, n, d, x3, y3;
    if (fp12_eq(&a->x, &b->x)) {
        fp12_add(&t, &a->y, &b->y);
        if (fp12_is_zero(&t)) { r->inf = 1; return; }
        fp12_sqr(&n, &a->x);
        fp12_add(&t, &n, &n);
        fp12_add(&n, &t, &n);            /* 3 x^2 */
        fp12_add(&d, &a->y, &a->y);      /* 2 y */
    } else {
        fp12_sub(&n, &b->y, &a->y);
        fp12_sub(&d, &b->x, &a->x);
    }
    fp12_inv(&t, &d);
    fp12_mul(&lam, &n, &t);
    fp12_sqr(&x3, &lam);
    fp12_sub(&x3, &x3, &a->x);
    fp12_sub(&x3, &x3, &b->x);
    fp12_sub(&t, &a->x, &x3);
    fp12_mul(&y3, &lam, &t);
    fp12_sub(&y3, &y3, &a->y);
    r->x = x3; r->y = y3; r->inf = 0;
}

/* line through p1,p2 evaluated at t — mirrors _linefunc */
static void linefunc(fp12 *out, const pt12 *p1, const pt12 *p2, const pt12 *t) {
    fp12 m, n, d, tmp;
    if (!fp12_eq(&p1->x, &p2->x)) {
        fp12_sub(&n, &p2->y, &p1->y);
        fp12_sub(&d, &p2->x, &p1->x);
    } else if (fp12_eq(&p1->y, &p2->y)) {
        fp12_sqr(&n, &p1->x);
        fp12_add(&tmp, &n, &n);
        fp12_add(&n, &tmp, &n);          /* 3 x^2 */
        fp12_add(&d, &p1->y, &p1->y);    /* 2 y */
    } else {
        fp12_sub(out, &t->x, &p1->x);
        return;
    }
    fp12_inv(&tmp, &d);
    fp12_mul(&m, &n, &tmp);
    fp12_sub(&tmp, &t->x, &p1->x);
    fp12_mul(&n, &m, &tmp);
    fp12_sub(&tmp, &t->y, &p1->y);
    fp12_sub(out, &n, &tmp);             /* m (xt-x1) - (yt-y1) */
}

/* embed a G2 affine point into E(Fp12): (x*w^2, y*w^3) with x,y in Fp2 */
static void twist_embed(pt12 *r, const fp2 *x, const fp2 *y) {
    memset(r, 0, sizeof(*r));
    r->x.c0.c1 = *x;   /* x * w^2 = fp12(fp6(0, x, 0), 0) */
    r->y.c1.c1 = *y;   /* y * w^3 = fp12(0, fp6(0, y, 0)) */
    r->inf = 0;
}

static void cast_g1(pt12 *r, const bfe *x, const bfe *y) {
    memset(r, 0, sizeof(*r));
    r->x.c0.c0.c0 = *x;
    r->y.c0.c0.c0 = *y;
    r->inf = 0;
}

/* Miller loop over 6t+2, Frobenius handled via generic pow by p, exactly as
 * ops/ecc/bn254.py _miller_loop */
static void miller_loop(fp12 *f_out, const pt12 *Q, const pt12 *P) {
    fp12 f, l;
    fp12_one(&f);
    if (Q->inf || P->inf) { *f_out = f; return; }
    pt12 R = *Q;
    for (int i = 63; i >= 0; i--) {
        fp12_sqr(&f, &f);
        linefunc(&l, &R, &R, P);
        fp12_mul(&f, &f, &l);
        pt12_add(&R, &R, &R);
        if ((ATE_LO >> i) & 1) {
            linefunc(&l, &R, Q, P);
            fp12_mul(&f, &f, &l);
            pt12_add(&R, &R, Q);
        }
    }
    (void)ATE_HI; /* bit 64 is the implicit leading R=Q initialisation */
    pt12 Q1, nQ2;
    fp12_pow_u256(&Q1.x, &Q->x, P_SCALAR);
    fp12_pow_u256(&Q1.y, &Q->y, P_SCALAR);
    Q1.inf = 0;
    fp12_pow_u256(&nQ2.x, &Q1.x, P_SCALAR);
    fp12_pow_u256(&l, &Q1.y, P_SCALAR);
    fp12_neg(&nQ2.y, &l);
    nQ2.inf = 0;
    linefunc(&l, &R, &Q1, P);
    fp12_mul(&f, &f, &l);
    pt12_add(&R, &R, &Q1);
    linefunc(&l, &R, &nQ2, P);
    fp12_mul(&f, &f, &l);
    *f_out = f;
}

/* ---------------- exported API ---------------- */

int zkevm_bn254_g1_add(const uint8_t ax[32], const uint8_t ay[32],
                       const uint8_t bx[32], const uint8_t by[32],
                       uint8_t ox[32], uint8_t oy[32]) {
    bfe x1, y1, x2, y2;
    fp_from_bytes(&x1, ax); fp_from_bytes(&y1, ay);
    fp_from_bytes(&x2, bx); fp_from_bytes(&y2, by);
    int inf1 = bfe_is_zero(&x1) && bfe_is_zero(&y1);
    int inf2 = bfe_is_zero(&x2) && bfe_is_zero(&y2);
    g1j p;
    g1j_set_inf(&p);
    if (!inf1) g1j_add_affine(&p, &p, &x1, &y1);
    if (!inf2) g1j_add_affine(&p, &p, &x2, &y2);
    bfe rx, ry;
    if (!g1j_to_affine(&rx, &ry, &p)) {
        memset(ox, 0, 32); memset(oy, 0, 32);
        return 0;
    }
    fp_to_bytes(ox, &rx);
    fp_to_bytes(oy, &ry);
    return 1;
}

int zkevm_bn254_g1_mul(const uint8_t px[32], const uint8_t py[32],
                       const uint8_t kb[32], uint8_t ox[32], uint8_t oy[32]) {
    bfe x, y;
    u64 k[4];
    fp_from_bytes(&x, px); fp_from_bytes(&y, py);
    scalar_from_bytes(k, kb);
    g1j acc;
    g1j_set_inf(&acc);
    if (!(bfe_is_zero(&x) && bfe_is_zero(&y)))
        g1j_mul_acc(&acc, &x, &y, k);
    bfe rx, ry;
    if (!g1j_to_affine(&rx, &ry, &acc)) {
        memset(ox, 0, 32); memset(oy, 0, 32);
        return 0;
    }
    fp_to_bytes(ox, &rx);
    fp_to_bytes(oy, &ry);
    return 1;
}

int zkevm_bn254_g1_msm(const uint8_t *xs, const uint8_t *ys,
                       const uint8_t *ks, size_t n,
                       uint8_t ox[32], uint8_t oy[32]) {
    g1j acc;
    g1j_set_inf(&acc);
    for (size_t i = 0; i < n; i++) {
        bfe x, y;
        u64 k[4];
        fp_from_bytes(&x, xs + 32 * i);
        fp_from_bytes(&y, ys + 32 * i);
        scalar_from_bytes(k, ks + 32 * i);
        if (!(bfe_is_zero(&x) && bfe_is_zero(&y)))
            g1j_mul_acc(&acc, &x, &y, k);
    }
    bfe rx, ry;
    if (!g1j_to_affine(&rx, &ry, &acc)) {
        memset(ox, 0, 32); memset(oy, 0, 32);
        return 0;
    }
    fp_to_bytes(ox, &rx);
    fp_to_bytes(oy, &ry);
    return 1;
}

int zkevm_bn254_g2_subgroup_check(const uint8_t x0[32], const uint8_t x1[32],
                                  const uint8_t y0[32], const uint8_t y1[32]) {
    fp2 x, y;
    fp_from_bytes(&x.c0, x0); fp_from_bytes(&x.c1, x1);
    fp_from_bytes(&y.c0, y0); fp_from_bytes(&y.c1, y1);
    if (fp2_is_zero(&x) && fp2_is_zero(&y))
        return 1; /* infinity is in every subgroup */
    g2j acc;
    g2j_set_inf(&acc);
    int started = 0;
    for (int i = 3; i >= 0; i--) {
        for (int b = 63; b >= 0; b--) {
            if (started)
                g2j_dbl(&acc, &acc);
            if ((ORDER_R[i] >> b) & 1) {
                g2j_add_affine(&acc, &acc, &x, &y);
                started = 1;
            }
        }
    }
    return g2j_is_inf(&acc);
}

/* g1s: n * 64 bytes (x||y); g2s: n * 128 bytes (x0||x1||y0||y1).
 *
 * PRECONDITION: every input point must be on-curve and subgroup-checked
 * (the circuit layer does this before calling, ops/ecc/bn254.py
 * pairing_check / zkevm_bn254_g2_subgroup_check).  linefunc/pt12_add do
 * not track the accumulator's point-at-infinity flag, so an unvalidated
 * non-subgroup G2 input could drive the Miller-loop accumulator through
 * infinity and produce a wrong verdict instead of an error. */
int zkevm_bn254_pairing_check(const uint8_t *g1s, const uint8_t *g2s,
                              size_t n) {
    fp12 f, m;
    fp12_one(&f);
    for (size_t i = 0; i < n; i++) {
        bfe px, py;
        fp2 qx, qy;
        fp_from_bytes(&px, g1s + 64 * i);
        fp_from_bytes(&py, g1s + 64 * i + 32);
        fp_from_bytes(&qx.c0, g2s + 128 * i);
        fp_from_bytes(&qx.c1, g2s + 128 * i + 32);
        fp_from_bytes(&qy.c0, g2s + 128 * i + 64);
        fp_from_bytes(&qy.c1, g2s + 128 * i + 96);
        int p_inf = bfe_is_zero(&px) && bfe_is_zero(&py);
        int q_inf = fp2_is_zero(&qx) && fp2_is_zero(&qy);
        if (p_inf || q_inf)
            continue; /* factor e(O, Q) = e(P, O) = 1 */
        pt12 Q, P;
        twist_embed(&Q, &qx, &qy);
        cast_g1(&P, &px, &py);
        miller_loop(&m, &Q, &P);
        fp12_mul(&f, &f, &m);
    }
    fp12 out;
    fp12_pow_bytes(&out, &f, FINAL_EXP, sizeof(FINAL_EXP));
    return fp12_is_one(&out);
}
