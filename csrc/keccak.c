/* Native keccak-256 for the witness-generation hot path.
 *
 * Witness building hashes every bytecode and tx-sign payload; the Python
 * permutation costs ~1ms per block while this one runs in ~1us.  Exposed
 * via ctypes (see zkevm_specs_tpu/runtime/native.py); batch API hashes many
 * inputs in one call to amortize FFI overhead.
 *
 * Build: make -C csrc   (produces libzkevm_native.so)
 */
#include <stdint.h>
#include <string.h>

#define ROTL64(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int RHO[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};
/* state index: A[x + 5y] */

static void keccak_f(uint64_t a[25]) {
  uint64_t b[25], c[5], d;
  for (int round = 0; round < 24; round++) {
    /* theta */
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++) {
      d = c[(x + 4) % 5] ^ ROTL64(c[(x + 1) % 5], 1);
      for (int y = 0; y < 5; y++) a[x + 5 * y] ^= d;
    }
    /* rho + pi */
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = ROTL64(a[x + 5 * y], RHO[x + 5 * y]);
    /* chi */
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    /* iota */
    a[0] ^= RC[round];
  }
}

void zkevm_keccak256(const uint8_t *data, uint64_t len, uint8_t *out) {
  uint64_t state[25];
  memset(state, 0, sizeof(state));
  const uint64_t rate = 136;

  uint64_t off = 0;
  while (len - off >= rate) {
    for (uint64_t i = 0; i < rate / 8; i++) {
      uint64_t lane;
      memcpy(&lane, data + off + 8 * i, 8);
      state[i] ^= lane;
    }
    keccak_f(state);
    off += rate;
  }
  /* last (partial) block with pad 0x01 .. 0x80 */
  uint8_t block[136];
  memset(block, 0, sizeof(block));
  memcpy(block, data + off, len - off);
  block[len - off] = 0x01;
  block[rate - 1] |= 0x80;
  for (uint64_t i = 0; i < rate / 8; i++) {
    uint64_t lane;
    memcpy(&lane, block + 8 * i, 8);
    state[i] ^= lane;
  }
  keccak_f(state);
  memcpy(out, state, 32);
}

/* Batch API: inputs concatenated; offsets has n+1 entries. */
void zkevm_keccak256_batch(const uint8_t *data, const uint64_t *offsets,
                           uint64_t n, uint8_t *out) {
  for (uint64_t i = 0; i < n; i++) {
    zkevm_keccak256(data + offsets[i], offsets[i + 1] - offsets[i],
                    out + 32 * i);
  }
}
