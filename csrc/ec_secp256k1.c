/* secp256k1 point arithmetic for the witness/crypto hot path.
 *
 * Replaces the role of eth_keys in the reference (util/ec.py:59-117): the
 * expensive double-scalar multiplications of ECDSA verify/recover run here
 * (Jacobian coordinates, 4x64-bit limbs, __int128 products, fast reduction
 * exploiting p = 2^256 - 2^32 - 977); the cheap mod-n scalar algebra stays
 * in Python (ops/ecc/secp256k1.py).
 *
 * API (all byte buffers are 32-byte big-endian):
 *   zkevm_secp256k1_double_mul(u1, u2, px, py, outx, outy) -> 1 if result
 *     is a finite point (out filled), 0 if infinity: computes u1*G + u2*P.
 *   zkevm_secp256k1_verify_batch(msg, r, s, px, py, n, out) — per-row
 *     ECDSA verify verdict bits; scalars u1/u2 are derived internally via
 *     mod-n inversion (binary extended gcd).
 */
#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

typedef struct { u64 v[4]; } fe;   /* little-endian 64-bit limbs */

static const fe FE_P = {{0xFFFFFFFEFFFFFC2FULL, 0xFFFFFFFFFFFFFFFFULL,
                         0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL}};
static const fe FE_N = {{0xBFD25E8CD0364141ULL, 0xBAAEDCE6AF48A03BULL,
                         0xFFFFFFFFFFFFFFFEULL, 0xFFFFFFFFFFFFFFFFULL}};
static const fe FE_GX = {{0x59F2815B16F81798ULL, 0x029BFCDB2DCE28D9ULL,
                          0x55A06295CE870B07ULL, 0x79BE667EF9DCBBACULL}};
static const fe FE_GY = {{0x9C47D08FFB10D4B8ULL, 0xFD17B448A6855419ULL,
                          0x5DA4FBFC0E1108A8ULL, 0x483ADA7726A3C465ULL}};

static int fe_is_zero(const fe *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static int fe_cmp(const fe *a, const fe *b) {
    for (int i = 3; i >= 0; i--) {
        if (a->v[i] < b->v[i]) return -1;
        if (a->v[i] > b->v[i]) return 1;
    }
    return 0;
}

static u64 fe_add_raw(fe *r, const fe *a, const fe *b) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        c += (u128)a->v[i] + b->v[i];
        r->v[i] = (u64)c;
        c >>= 64;
    }
    return (u64)c;
}

static u64 fe_sub_raw(fe *r, const fe *a, const fe *b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        r->v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    return (u64)borrow;
}

/* ---- arithmetic mod p (sparse prime) ---------------------------------- */

static void fe_norm_p(fe *a) {
    if (fe_cmp(a, &FE_P) >= 0) fe_sub_raw(a, a, &FE_P);
}

static void fe_add_p(fe *r, const fe *a, const fe *b) {
    u64 c = fe_add_raw(r, a, b);
    if (c || fe_cmp(r, &FE_P) >= 0) fe_sub_raw(r, r, &FE_P);
}

static void fe_sub_p(fe *r, const fe *a, const fe *b) {
    if (fe_sub_raw(r, a, b)) fe_add_raw(r, r, &FE_P);
}

/* reduce a 512-bit product mod p: hi*2^256 == hi*(2^32+977) (mod p) */
static void fe_reduce512_p(fe *r, const u64 t[8]) {
    const u128 C = ((u128)1 << 32) + 977;
    u64 acc[5];
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        c += (u128)t[i] + (u128)t[i + 4] * C;
        acc[i] = (u64)c;
        c >>= 64;
    }
    acc[4] = (u64)c;  /* < 2^34 */
    /* fold acc[4] once more */
    c = (u128)acc[0] + (u128)acc[4] * C;
    r->v[0] = (u64)c; c >>= 64;
    for (int i = 1; i < 4; i++) {
        c += acc[i];
        r->v[i] = (u64)c;
        c >>= 64;
    }
    if (c) fe_sub_raw(r, r, &FE_P);  /* carry means >= 2^256 > p: one fold */
    fe_norm_p(r);
}

static void fe_mul_p(fe *r, const fe *a, const fe *b) {
    u64 t[8] = {0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a->v[i] * b->v[j] + t[i + j] + carry;
            t[i + j] = (u64)cur;
            carry = cur >> 64;
        }
        t[i + 4] = (u64)carry;
    }
    fe_reduce512_p(r, t);
}

static void fe_sqr_p(fe *r, const fe *a) { fe_mul_p(r, a, a); }

/* binary extended gcd inversion modulo an odd modulus */
static void fe_inv_mod(fe *r, const fe *a, const fe *m) {
    fe u = *a, v = *m;
    fe x1 = {{1, 0, 0, 0}}, x2 = {{0, 0, 0, 0}};
    while (!fe_is_zero(&u) && !(u.v[0] == 1 && !(u.v[1] | u.v[2] | u.v[3]))) {
        while (!(u.v[0] & 1)) {
            /* u >>= 1 */
            for (int i = 0; i < 3; i++) u.v[i] = (u.v[i] >> 1) | (u.v[i + 1] << 63);
            u.v[3] >>= 1;
            if (x1.v[0] & 1) {
                u64 c = fe_add_raw(&x1, &x1, m);
                for (int i = 0; i < 3; i++) x1.v[i] = (x1.v[i] >> 1) | (x1.v[i + 1] << 63);
                x1.v[3] = (x1.v[3] >> 1) | (c << 63);
            } else {
                for (int i = 0; i < 3; i++) x1.v[i] = (x1.v[i] >> 1) | (x1.v[i + 1] << 63);
                x1.v[3] >>= 1;
            }
        }
        while (!fe_is_zero(&v) && !(v.v[0] & 1)) {
            for (int i = 0; i < 3; i++) v.v[i] = (v.v[i] >> 1) | (v.v[i + 1] << 63);
            v.v[3] >>= 1;
            if (x2.v[0] & 1) {
                u64 c = fe_add_raw(&x2, &x2, m);
                for (int i = 0; i < 3; i++) x2.v[i] = (x2.v[i] >> 1) | (x2.v[i + 1] << 63);
                x2.v[3] = (x2.v[3] >> 1) | (c << 63);
            } else {
                for (int i = 0; i < 3; i++) x2.v[i] = (x2.v[i] >> 1) | (x2.v[i + 1] << 63);
                x2.v[3] >>= 1;
            }
        }
        if (fe_cmp(&u, &v) >= 0) {
            fe_sub_raw(&u, &u, &v);
            if (fe_sub_raw(&x1, &x1, &x2)) fe_add_raw(&x1, &x1, m);
        } else {
            fe_sub_raw(&v, &v, &u);
            if (fe_sub_raw(&x2, &x2, &x1)) fe_add_raw(&x2, &x2, m);
        }
    }
    if (fe_is_zero(&u)) *r = x2; else *r = x1;
    /* normalize into [0, m) */
    while (fe_cmp(r, m) >= 0) fe_sub_raw(r, r, m);
}

/* ---- scalar arithmetic mod n ------------------------------------------ */

static void fe_mul_mod_n(fe *r, const fe *a, const fe *b) {
    /* schoolbook 512-bit product then slow reduction by shift-subtract —
     * only used a handful of times per signature, so simplicity wins */
    u64 t[8] = {0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a->v[i] * b->v[j] + t[i + j] + carry;
            t[i + j] = (u64)cur;
            carry = cur >> 64;
        }
        t[i + 4] = (u64)carry;
    }
    /* binary long division: fold from the top bit down */
    fe acc = {{0, 0, 0, 0}};
    for (int bit = 511; bit >= 0; bit--) {
        /* acc = acc*2 + bit */
        u64 carry = 0;
        for (int i = 0; i < 4; i++) {
            u64 nv = (acc.v[i] << 1) | carry;
            carry = acc.v[i] >> 63;
            acc.v[i] = nv;
        }
        acc.v[0] |= (t[bit / 64] >> (bit % 64)) & 1;
        if (carry || fe_cmp(&acc, &FE_N) >= 0) fe_sub_raw(&acc, &acc, &FE_N);
    }
    *r = acc;
}

/* ---- Jacobian point arithmetic ---------------------------------------- */

typedef struct { fe x, y, z; int inf; } jac;

static void jac_set_affine(jac *r, const fe *x, const fe *y) {
    r->x = *x; r->y = *y;
    memset(&r->z, 0, sizeof(fe)); r->z.v[0] = 1;
    r->inf = 0;
}

static void jac_double(jac *r, const jac *p) {
    if (p->inf || fe_is_zero(&p->y)) { r->inf = 1; return; }
    fe a, b, c, d, e, f, t;
    fe_sqr_p(&a, &p->x);                 /* XX */
    fe_sqr_p(&b, &p->y);                 /* YY */
    fe_sqr_p(&c, &b);                    /* YYYY */
    fe_add_p(&t, &p->x, &b);
    fe_sqr_p(&t, &t);
    fe_sub_p(&t, &t, &a);
    fe_sub_p(&t, &t, &c);
    fe_add_p(&d, &t, &t);                /* S = 2*((X+YY)^2 - XX - YYYY) */
    fe_add_p(&e, &a, &a);
    fe_add_p(&e, &e, &a);                /* M = 3*XX */
    fe_sqr_p(&f, &e);                    /* M^2 */
    fe_sub_p(&f, &f, &d);
    fe_sub_p(&f, &f, &d);                /* X3 = M^2 - 2S */
    r->x = f;
    fe_sub_p(&t, &d, &f);
    fe_mul_p(&t, &e, &t);
    fe c8; fe_add_p(&c8, &c, &c); fe_add_p(&c8, &c8, &c8); fe_add_p(&c8, &c8, &c8);
    fe_sub_p(&r->y, &t, &c8);            /* Y3 = M*(S - X3) - 8*YYYY */
    fe_mul_p(&t, &p->y, &p->z);
    fe_add_p(&r->z, &t, &t);             /* Z3 = 2*Y*Z */
    r->inf = 0;
}

static void jac_add(jac *r, const jac *p, const jac *q) {
    if (p->inf) { *r = *q; return; }
    if (q->inf) { *r = *p; return; }
    fe z1z1, z2z2, u1, u2, s1, s2, h, i, j, rr, v, t;
    fe_sqr_p(&z1z1, &p->z);
    fe_sqr_p(&z2z2, &q->z);
    fe_mul_p(&u1, &p->x, &z2z2);
    fe_mul_p(&u2, &q->x, &z1z1);
    fe_mul_p(&t, &q->z, &z2z2);
    fe_mul_p(&s1, &p->y, &t);
    fe_mul_p(&t, &p->z, &z1z1);
    fe_mul_p(&s2, &q->y, &t);
    fe_sub_p(&h, &u2, &u1);
    fe_sub_p(&rr, &s2, &s1);
    if (fe_is_zero(&h)) {
        if (fe_is_zero(&rr)) { jac_double(r, p); return; }
        r->inf = 1; return;
    }
    fe_add_p(&i, &h, &h);
    fe_sqr_p(&i, &i);                    /* I = (2H)^2 */
    fe_mul_p(&j, &h, &i);                /* J = H*I */
    fe_add_p(&rr, &rr, &rr);             /* r = 2*(S2-S1) */
    fe_mul_p(&v, &u1, &i);               /* V = U1*I */
    fe x3;
    fe_sqr_p(&x3, &rr);
    fe_sub_p(&x3, &x3, &j);
    fe_sub_p(&x3, &x3, &v);
    fe_sub_p(&x3, &x3, &v);              /* X3 = r^2 - J - 2V */
    r->x = x3;
    fe_sub_p(&t, &v, &x3);
    fe_mul_p(&t, &rr, &t);
    fe s1j; fe_mul_p(&s1j, &s1, &j);
    fe_add_p(&s1j, &s1j, &s1j);
    fe_sub_p(&r->y, &t, &s1j);           /* Y3 = r*(V-X3) - 2*S1*J */
    fe zz; fe_add_p(&zz, &p->z, &q->z);
    fe_sqr_p(&zz, &zz);
    fe_sub_p(&zz, &zz, &z1z1);
    fe_sub_p(&zz, &zz, &z2z2);
    fe_mul_p(&r->z, &zz, &h);            /* Z3 = ((Z1+Z2)^2-Z1Z1-Z2Z2)*H */
    r->inf = 0;
}

/* u1*G + u2*P via interleaved double-and-add (Shamir/Straus) */
static void jac_double_mul(jac *r, const fe *u1, const fe *u2,
                           const fe *px, const fe *py) {
    jac g, p, gp;
    jac_set_affine(&g, &FE_GX, &FE_GY);
    jac_set_affine(&p, px, py);
    jac_add(&gp, &g, &p);
    r->inf = 1;
    for (int bit = 255; bit >= 0; bit--) {
        if (!r->inf) { jac tmp; jac_double(&tmp, r); *r = tmp; }
        int b1 = (u1->v[bit / 64] >> (bit % 64)) & 1;
        int b2 = (u2->v[bit / 64] >> (bit % 64)) & 1;
        const jac *addend = 0;
        if (b1 && b2) addend = &gp;
        else if (b1) addend = &g;
        else if (b2) addend = &p;
        if (addend) { jac tmp; jac_add(&tmp, r, addend); *r = tmp; }
    }
}

static void jac_to_affine(const jac *p, fe *x, fe *y) {
    fe zi, zi2, zi3;
    fe_inv_mod(&zi, &p->z, &FE_P);
    fe_sqr_p(&zi2, &zi);
    fe_mul_p(&zi3, &zi2, &zi);
    fe_mul_p(x, &p->x, &zi2);
    fe_mul_p(y, &p->y, &zi3);
}

/* ---- byte IO ----------------------------------------------------------- */

static void fe_from_be(fe *r, const uint8_t b[32]) {
    for (int i = 0; i < 4; i++) {
        u64 w = 0;
        for (int j = 0; j < 8; j++) w = (w << 8) | b[(3 - i) * 8 + j];
        r->v[i] = w;
    }
}

static void fe_to_be(uint8_t b[32], const fe *a) {
    for (int i = 0; i < 4; i++) {
        u64 w = a->v[3 - i];
        for (int j = 7; j >= 0; j--) { b[i * 8 + j] = (uint8_t)w; w >>= 8; }
    }
}

/* ---- public API -------------------------------------------------------- */

int zkevm_secp256k1_double_mul(const uint8_t u1b[32], const uint8_t u2b[32],
                               const uint8_t pxb[32], const uint8_t pyb[32],
                               uint8_t outx[32], uint8_t outy[32]) {
    fe u1, u2, px, py;
    fe_from_be(&u1, u1b);
    fe_from_be(&u2, u2b);
    fe_from_be(&px, pxb);
    fe_from_be(&py, pyb);
    jac r;
    jac_double_mul(&r, &u1, &u2, &px, &py);
    if (r.inf) return 0;
    fe x, y;
    jac_to_affine(&r, &x, &y);
    fe_to_be(outx, &x);
    fe_to_be(outy, &y);
    return 1;
}

/* batch ECDSA verify: out[i] = 1 iff signature i is valid */
void zkevm_secp256k1_verify_batch(const uint8_t *msg, const uint8_t *r_,
                                  const uint8_t *s_, const uint8_t *px_,
                                  const uint8_t *py_, uint64_t n,
                                  uint8_t *out) {
    for (uint64_t k = 0; k < n; k++) {
        fe z, r, s, px, py;
        fe_from_be(&z, msg + 32 * k);
        fe_from_be(&r, r_ + 32 * k);
        fe_from_be(&s, s_ + 32 * k);
        fe_from_be(&px, px_ + 32 * k);
        fe_from_be(&py, py_ + 32 * k);
        out[k] = 0;
        if (fe_is_zero(&r) || fe_is_zero(&s)) continue;
        if (fe_cmp(&r, &FE_N) >= 0 || fe_cmp(&s, &FE_N) >= 0) continue;
        /* on-curve check: y^2 == x^3 + 7 */
        fe y2, x3, seven = {{7, 0, 0, 0}};
        fe_sqr_p(&y2, &py);
        fe_sqr_p(&x3, &px);
        fe_mul_p(&x3, &x3, &px);
        fe_add_p(&x3, &x3, &seven);
        if (fe_cmp(&y2, &x3) != 0) continue;
        fe w, u1, u2;
        fe_inv_mod(&w, &s, &FE_N);
        /* z, r may exceed n for u1/u2 derivation: reduce first */
        fe zr = z; while (fe_cmp(&zr, &FE_N) >= 0) fe_sub_raw(&zr, &zr, &FE_N);
        fe_mul_mod_n(&u1, &zr, &w);
        fe_mul_mod_n(&u2, &r, &w);
        jac res;
        jac_double_mul(&res, &u1, &u2, &px, &py);
        if (res.inf) continue;
        fe x, y;
        jac_to_affine(&res, &x, &y);
        while (fe_cmp(&x, &FE_N) >= 0) fe_sub_raw(&x, &x, &FE_N);
        out[k] = fe_cmp(&x, &r) == 0;
    }
}
