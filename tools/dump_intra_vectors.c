/* Test-vector dumper: calls the reference encoder's intra prediction
 * strategies through libuvg266.so and writes (refs, mode, size) -> pred
 * pairs to a binary file.  Dev-time tool only; the resulting vectors are
 * committed for the pytest suite (tests/vectors/intra_vectors.bin).
 *
 * Record layout (little endian):
 *   int32 w, h, orig_mode, kind   (kind 0=angular, 1=planar, 2=pdpc-planar)
 *   uint8 ref_above[256], ref_left[256]
 *   uint8 pred[w*h]
 *
 * Build:
 *   gcc -O2 tools/dump_intra_vectors.c -o /tmp/dump_intra \
 *       -L/root/repo/.refbuild -luvg266 -Wl,-rpath,/root/repo/.refbuild
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

typedef uint8_t uvg_pixel;

typedef struct {
  int16_t x, y;
  uint8_t local_x, local_y;
  uint8_t width, height;
  uint8_t chroma_width, chroma_height;
} cu_loc_t;

#define INTRA_REF_LENGTH (2 * 128 + 3 + 33 * 3) /* intra.h:46, MAX_REF_LINE_IDX=3 */
typedef struct {
  uvg_pixel left[INTRA_REF_LENGTH];
  uvg_pixel top[INTRA_REF_LENGTH];
} uvg_intra_ref;

typedef void (angular_pred_func)(
    const cu_loc_t* cu_loc, const int8_t intra_mode, const int8_t channel_type,
    const uvg_pixel* in_ref_above, const uvg_pixel* in_ref_left,
    uvg_pixel* dst, const uint8_t multi_ref_idx, const uint8_t isp_mode,
    const int cu_dim);
typedef void (planar_pred_func)(
    const cu_loc_t* cu_loc, int color,
    const uvg_pixel* ref_top, const uvg_pixel* ref_left, uvg_pixel* dst);
typedef void (pdpc_func)(
    const int mode, const cu_loc_t* cu_loc, const int color,
    const uvg_intra_ref* used_ref, uvg_pixel* dst);

extern angular_pred_func *uvg_angular_pred;
extern planar_pred_func *uvg_intra_pred_planar;
extern pdpc_func *uvg_pdpc_planar_dc;
int uvg_strategyselector_init(int32_t cpuid, uint8_t bitdepth);

static uint32_t rng_state = 12345;
static uint32_t xorshift(void) {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 17;
  rng_state ^= rng_state << 5;
  return rng_state;
}

static int ilog2(int v) { int r = 0; while (v > 1) { v >>= 1; r++; } return r; }

static int wide_angle(int mode, int lw, int lh) {
  const int mode_shift[] = {0, 6, 10, 12, 14, 15};
  if (lw != lh && mode > 1 && mode <= 66) {
    int d = abs(lw - lh);
    if (lw > lh && mode < 2 + mode_shift[d]) return mode + 65;
    if (lh > lw && mode > 66 - mode_shift[d]) return mode - 65;
  }
  return mode;
}

int main(void) {
  if (!uvg_strategyselector_init(0, 8)) { fprintf(stderr, "init fail\n"); return 1; }
  FILE* f = fopen("/tmp/intra_vectors.bin", "wb");
  const int sizes[][2] = {{4,4},{8,8},{16,16},{32,32},{4,8},{8,4},{16,4},{4,16},{8,32},{32,8},{16,32}};
  const int nsizes = sizeof(sizes)/sizeof(sizes[0]);
  static uvg_pixel ref_above[512], ref_left[512], dst[64*64];
  for (int s = 0; s < nsizes; ++s) {
    int w = sizes[s][0], h = sizes[s][1];
    cu_loc_t loc = {0, 0, 0, 0, (uint8_t)w, (uint8_t)h, (uint8_t)(w/2), (uint8_t)(h/2)};
    for (int mode = 2; mode <= 66; ++mode) {
      int pm = wide_angle(mode, ilog2(w), ilog2(h));
      for (int i = 0; i < 512; ++i) { ref_above[i] = xorshift() & 255; ref_left[i] = xorshift() & 255; }
      ref_left[0] = ref_above[0];
      uvg_angular_pred(&loc, (int8_t)pm, 0, ref_above, ref_left, dst, 0, 0, w);
      int32_t hdr[4] = {w, h, mode, 0};
      fwrite(hdr, 4, 4, f);
      fwrite(ref_above, 1, 256, f);
      fwrite(ref_left, 1, 256, f);
      fwrite(dst, 1, (size_t)(w*h), f);
    }
    /* planar + pdpc */
    for (int rep = 0; rep < 4; ++rep) {
      for (int i = 0; i < 512; ++i) { ref_above[i] = xorshift() & 255; ref_left[i] = xorshift() & 255; }
      ref_left[0] = ref_above[0];
      uvg_intra_pred_planar(&loc, 0, ref_above, ref_left, dst);
      int32_t hdr[4] = {w, h, 0, 1};
      fwrite(hdr, 4, 4, f);
      fwrite(ref_above, 1, 256, f);
      fwrite(ref_left, 1, 256, f);
      fwrite(dst, 1, (size_t)(w*h), f);
      /* apply pdpc on top of the planar prediction */
      uvg_intra_ref ur;
      memcpy(ur.top, ref_above, sizeof(ur.top));
      memcpy(ur.left, ref_left, sizeof(ur.left));
      uvg_pdpc_planar_dc(0, &loc, 0, &ur, dst);
      int32_t hdr2[4] = {w, h, 0, 2};
      fwrite(hdr2, 4, 4, f);
      fwrite(ref_above, 1, 256, f);
      fwrite(ref_left, 1, 256, f);
      fwrite(dst, 1, (size_t)(w*h), f);
    }
  }
  fclose(f);
  return 0;
}
