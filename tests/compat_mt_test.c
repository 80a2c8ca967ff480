/* Multithreaded C consumer of libbliss (bliss-tpu's drop-in C ABI).
 *
 * N pthreads concurrently run bl_analyze on their own bl_song structs,
 * several rounds each, and every result must match the reference's own
 * golden force vectors (reference tests/test_analyze.c:32-35,65-68).
 * This exercises the embedded-interpreter GIL handoff: the reference
 * advertises multithreaded use (reference README.md:5, the pthread
 * orchestration in src/analyze.c:34-62), so concurrent bl_analyze from
 * distinct threads must neither deadlock nor corrupt results. Decode
 * runs truly parallel (no interpreter involved); the analysis step
 * serializes on the GIL — see docs/OPERATIONS.md "C consumers".
 */
#include "bliss.h"

#include <math.h>
#include <pthread.h>
#include <stdio.h>
#include <string.h>

#define N_THREADS 4
#define N_ROUNDS 2

typedef struct {
  const char *file;
  float expect[4]; /* tempo, amplitude, frequency, attack */
  int failures;
} job_t;

static void *worker(void *arg) {
  job_t *job = (job_t *)arg;
  for (int r = 0; r < N_ROUNDS; ++r) {
    struct bl_song song;
    bl_initialize_song(&song);
    if (bl_analyze(job->file, &song) == BL_UNEXPECTED) {
      fprintf(stderr, "%s: bl_analyze failed\n", job->file);
      job->failures++;
      bl_free_song(&song);
      continue;
    }
    const float got[4] = {song.force_vector.tempo, song.force_vector.amplitude,
                          song.force_vector.frequency,
                          song.force_vector.attack};
    for (int i = 0; i < 4; ++i) {
      if (fabsf(got[i] - job->expect[i]) > 2e-5f) {
        fprintf(stderr, "%s component %d: got %f want %f\n", job->file, i,
                got[i], job->expect[i]);
        job->failures++;
      }
    }
    bl_free_song(&song);
  }
  return NULL;
}

int main(void) {
  /* golden vectors from the reference's test_analyze.c */
  const float e16[4] = {-8.945454f, -10.641844f, -10.136086f, -15.560563f};
  const float e32[4] = {-8.218182f, -10.641695f, -10.179875f, -15.561186f};
  job_t jobs[N_THREADS];
  pthread_t tids[N_THREADS];
  for (int t = 0; t < N_THREADS; ++t) {
    jobs[t].file =
        (t % 2) ? "../audio/song_s32.flac" : "../audio/song.flac";
    memcpy(jobs[t].expect, (t % 2) ? e32 : e16, sizeof(e16));
    jobs[t].failures = 0;
  }
  for (int t = 0; t < N_THREADS; ++t) {
    if (pthread_create(&tids[t], NULL, worker, &jobs[t]) != 0) {
      fprintf(stderr, "pthread_create failed\n");
      return 2;
    }
  }
  int total = 0;
  for (int t = 0; t < N_THREADS; ++t) {
    pthread_join(tids[t], NULL);
    total += jobs[t].failures;
  }
  if (total) {
    printf("FAIL: %d mismatches across %d threads x %d rounds\n", total,
           N_THREADS, N_ROUNDS);
    return 1;
  }
  printf("OK: %d threads x %d rounds of concurrent bl_analyze, all golden\n",
         N_THREADS, N_ROUNDS);
  return 0;
}
