/* Throughput benchmark for the reference C library: full bl_analyze
 * (decode + all three analyzers) on a given file, repeated; prints
 * songs/sec. This is the CPU baseline the TPU pipeline is measured
 * against. */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#include "bliss.h"

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s <audiofile> <iterations> <e2e|analysis>\n",
            argv[0]);
    return 1;
  }
  int iters = atoi(argv[2]);
  int analysis_only = argv[3][0] == 'a';
  struct timespec t0, t1;

  /* warmup (also validates the file decodes) */
  struct bl_song song;
  if (bl_analyze(argv[1], &song) == BL_UNEXPECTED) {
    fprintf(stderr, "analysis failed\n");
    return 1;
  }

  clock_gettime(CLOCK_MONOTONIC, &t0);
  if (analysis_only) {
    /* PCM -> features only (the part the TPU pipeline runs on-device):
     * reuse the decoded buffer, loop the three analyzers. */
    for (int i = 0; i < iters; ++i) {
      struct envelope_result_s env = {0.0f, 0.0f};
      volatile float a = bl_amplitude_sort(&song);
      volatile float f = bl_frequency_sort(&song);
      bl_envelope_sort(&song, &env);
      (void)a;
      (void)f;
    }
  } else {
    for (int i = 0; i < iters; ++i) {
      struct bl_song s;
      bl_analyze(argv[1], &s);
      bl_free_song(&s);
    }
  }
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
  bl_free_song(&song);
  printf("{\"songs_per_sec\": %.4f, \"seconds\": %.3f, \"iters\": %d}\n",
         iters / dt, dt, iters);
  return 0;
}
