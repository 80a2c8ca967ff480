// bliss-tpu C compatibility library.
//
// Implements the reference's public C surface (see include/bliss.h) on top
// of this framework:
//   - decode: the native libav decoder (io/_native/decoder.cc), linked
//     directly — no interpreter involved.
//   - analysis (bl_analyze / bl_amplitude_sort / bl_frequency_sort /
//     bl_envelope_sort): the JAX analyzers, called through an embedded
//     CPython interpreter that is initialized lazily on first use. By
//     default the embedded session runs the float64 CPU parity
//     configuration so results match the reference within its own test
//     epsilon; set BLISS_TPU_COMPAT_MODE=tpu to use the float32 accelerator
//     pipeline instead.
//   - distance/cosine + helpers: plain C++ (identical arithmetic).
//
// The reference's own test programs (tests/test_analyze.c,
// tests/test_decode.c) link and pass against this library — see
// tests/test_compat_abi.py.

#include "include/bliss.h"

#include <Python.h>
#ifdef _WIN32
#include <windows.h>
#else
#include <dlfcn.h>
#endif

#include <cmath>
#include <string>
#include <cstdint>
#include <cstring>
#include <mutex>

// ---- native decoder ABI (io/_native/decoder.cc) ----------------------------

extern "C" {
typedef struct {
  int16_t *samples;
  int64_t n_samples;
  int32_t channels;
  int32_t sample_rate;
  int32_t bitrate;
  int32_t nb_bytes_per_sample;
  int32_t resampled;
  uint64_t duration;
  char *artist;
  char *title;
  char *album;
  char *tracknumber;
  char *genre;
  char *error;
} bt_decoded;
int bt_decode(const char *filename, bt_decoded *out);
void bt_free_decoded(bt_decoded *d);
}

namespace {

char *dup_cstr(const char *s) {
  if (!s) return nullptr;
  char *out = static_cast<char *>(malloc(strlen(s) + 1));
  strcpy(out, s);
  return out;
}

// ---- embedded interpreter ---------------------------------------------------

std::once_flag g_py_once;
PyObject *g_helpers = nullptr;  // dict holding the bootstrap namespace

const char *kBootstrap = R"PY(
import os, sys
_root = os.environ.get('BLISS_TPU_ROOT')
if _root and _root not in sys.path:
    sys.path.insert(0, _root)
import jax
mode = os.environ.get('BLISS_TPU_COMPAT_MODE', 'parity')
if mode != 'tpu':
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
import numpy as np
from bliss_tpu.api import analyze_features
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import (PCMBatch, amplitude_scores, frequency_scores,
                                envelope_scores)
_cfg = AnalysisConfig.for_parity() if mode != 'tpu' else AnalysisConfig.for_tpu()

def _batch(mem, n, duration):
    pcm = np.frombuffer(mem, dtype=np.int16, count=n)
    return PCMBatch.from_arrays([pcm], [max(int(duration), 1)])

def analyze(mem, n, duration):
    feats = analyze_features(_batch(mem, n, duration), _cfg)[0]
    return tuple(float(x) for x in feats)

def amplitude(mem, n):
    return float(np.asarray(amplitude_scores(_batch(mem, n, 1), _cfg))[0])

def frequency(mem, n):
    return float(np.asarray(frequency_scores(_batch(mem, n, 1), _cfg))[0])

def envelope(mem, n, duration):
    t, a = envelope_scores(_batch(mem, n, duration), _cfg)
    return float(np.asarray(t)[0]), float(np.asarray(a)[0])
)PY";

void init_python() {
  std::call_once(g_py_once, [] {
    // Make the bliss_tpu package importable: walk up from this shared
    // object (bliss_tpu/compat/libbliss.so -> repo root).
    if (!getenv("BLISS_TPU_ROOT")) {
      std::string p;
#ifdef _WIN32
      HMODULE mod = nullptr;
      if (GetModuleHandleExA(GET_MODULE_HANDLE_EX_FLAG_FROM_ADDRESS |
                                 GET_MODULE_HANDLE_EX_FLAG_UNCHANGED_REFCOUNT,
                             reinterpret_cast<LPCSTR>(&init_python), &mod)) {
        char buf[MAX_PATH];
        DWORD len = GetModuleFileNameA(mod, buf, MAX_PATH);
        if (len > 0 && len < MAX_PATH) p.assign(buf, len);
      }
#else
      Dl_info info;
      if (dladdr(reinterpret_cast<void *>(&init_python), &info) &&
          info.dli_fname) {
        p = info.dli_fname;
      }
#endif
      if (!p.empty()) {
        for (int up = 0; up < 3; ++up) {
          size_t slash = p.find_last_of("/\\");
          if (slash == std::string::npos) break;
          p.resize(slash);
        }
      }
      if (!p.empty()) {
#ifdef _WIN32
        _putenv_s("BLISS_TPU_ROOT", p.c_str());
#else
        setenv("BLISS_TPU_ROOT", p.c_str(), 0);
#endif
      }
    }
    bool we_initialized = false;
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      we_initialized = true;
    }
    PyGILState_STATE gs = PyGILState_Ensure();
    PyObject *main_mod = PyImport_AddModule("__main__");
    PyObject *globals = PyModule_GetDict(main_mod);
    g_helpers = PyDict_New();
    PyDict_Update(g_helpers, globals);
    PyObject *res =
        PyRun_String(kBootstrap, Py_file_input, g_helpers, g_helpers);
    if (!res) {
      PyErr_Print();
      fprintf(stderr, "bliss-tpu compat: failed to bootstrap interpreter\n");
    }
    Py_XDECREF(res);
    PyGILState_Release(gs);
    if (we_initialized) {
      // Py_InitializeEx left this thread holding the GIL, and the
      // PyGILState_Release above was a no-op (the state was LOCKED).
      // Without dropping it here the first caller's thread keeps the GIL
      // forever once it returns to C, and every OTHER thread's
      // PyGILState_Ensure deadlocks — i.e. a multithreaded C consumer
      // (the reference advertises "multithreaded", reference README.md:5,
      // src/analyze.c:34-62) hangs on its second thread. Release the GIL
      // so all subsequent access goes through balanced Ensure/Release
      // pairs on any thread.
      PyEval_SaveThread();
    }
  });
}

// Call helper `name` with the song PCM (+ extra long args); returns a new
// reference to the result or nullptr.
PyObject *call_helper(const char *name, struct bl_song const *song,
                      bool with_duration) {
  init_python();
  if (!g_helpers) return nullptr;
  PyGILState_STATE gs = PyGILState_Ensure();
  PyObject *fn = PyDict_GetItemString(g_helpers, name);  // borrowed
  PyObject *result = nullptr;
  if (fn) {
    PyObject *mem = PyMemoryView_FromMemory(
        reinterpret_cast<char *>(song->sample_array),
        static_cast<Py_ssize_t>(song->nSamples) * 2, PyBUF_READ);
    if (with_duration) {
      result = PyObject_CallFunction(fn, "OlK", mem, (long)song->nSamples,
                                     (unsigned long long)song->duration);
    } else {
      result = PyObject_CallFunction(fn, "Ol", mem, (long)song->nSamples);
    }
    if (!result) PyErr_Print();
    Py_XDECREF(mem);
  }
  PyGILState_Release(gs);
  return result;  // caller must hold GIL to decref; see helpers below
}

double tuple_item(PyObject *tup, int i) {
  PyGILState_STATE gs = PyGILState_Ensure();
  double v = PyFloat_AsDouble(PyTuple_GetItem(tup, i));
  PyGILState_Release(gs);
  return v;
}

void drop(PyObject *o) {
  PyGILState_STATE gs = PyGILState_Ensure();
  Py_XDECREF(o);
  PyGILState_Release(gs);
}

float vec_distance(struct force_vector_s a, struct force_vector_s b) {
  double dt = a.tempo - b.tempo;
  double da = a.amplitude - b.amplitude;
  double df = a.frequency - b.frequency;
  double dk = a.attack - b.attack;
  return (float)sqrt(dt * dt + da * da + df * df + dk * dk);
}

float vec_cosine(struct force_vector_s a, struct force_vector_s b) {
  double num = a.tempo * b.tempo + a.amplitude * b.amplitude +
               a.frequency * b.frequency + a.attack * b.attack;
  double na = sqrt(a.tempo * a.tempo + a.amplitude * a.amplitude +
                   a.frequency * a.frequency + a.attack * a.attack);
  double nb = sqrt(b.tempo * b.tempo + b.amplitude * b.amplitude +
                   b.frequency * b.frequency + b.attack * b.attack);
  return (float)(num / (na * nb));
}

}  // namespace

extern "C" {

void bl_initialize_song(struct bl_song *const song) {
  song->artist = nullptr;
  song->title = nullptr;
  song->album = nullptr;
  song->tracknumber = nullptr;
  song->sample_array = nullptr;
  song->filename = nullptr;
  song->genre = nullptr;
}

void bl_free_song(struct bl_song *const song) {
  free(song->artist);
  free(song->title);
  free(song->album);
  free(song->tracknumber);
  free(song->sample_array);
  free(song->filename);
  free(song->genre);
  bl_initialize_song(song);
}

int bl_audio_decode(char const *const filename, struct bl_song *const song) {
  bt_decoded d;
  if (bt_decode(filename, &d) != 0) {
    fprintf(stderr, "bliss-tpu: %s\n", d.error ? d.error : "decode failed");
    bt_free_decoded(&d);
    return BL_UNEXPECTED;
  }
  song->sample_array =
      static_cast<int8_t *>(malloc((size_t)d.n_samples * 2));
  memcpy(song->sample_array, d.samples, (size_t)d.n_samples * 2);
  song->nSamples = (int)d.n_samples;
  song->channels = d.channels;
  song->sample_rate = d.sample_rate;
  song->bitrate = d.bitrate;
  song->nb_bytes_per_sample = d.nb_bytes_per_sample;
  song->resampled = d.resampled;
  song->duration = d.duration;
  song->filename = dup_cstr(filename);
  song->artist = dup_cstr(d.artist);
  song->title = dup_cstr(d.title);
  song->album = dup_cstr(d.album);
  song->tracknumber = dup_cstr(d.tracknumber);
  song->genre = dup_cstr(d.genre);
  bt_free_decoded(&d);
  return BL_OK;
}

int bl_analyze(char const *const filename, struct bl_song *current_song) {
  if (bl_audio_decode(filename, current_song) != BL_OK) {
    fprintf(stderr, "Couldn't decode song\n");
    return BL_UNEXPECTED;
  }
  PyObject *res = call_helper("analyze", current_song, true);
  if (!res) return BL_UNEXPECTED;
  current_song->force_vector.tempo = (float)tuple_item(res, 0);
  current_song->force_vector.amplitude = (float)tuple_item(res, 1);
  current_song->force_vector.frequency = (float)tuple_item(res, 2);
  current_song->force_vector.attack = (float)tuple_item(res, 3);
  drop(res);
  float rating = fmaxf(current_song->force_vector.tempo, 0.0f) +
                 current_song->force_vector.amplitude +
                 current_song->force_vector.frequency +
                 fmaxf(current_song->force_vector.attack, 0.0f);
  current_song->force = rating;
  current_song->calm_or_loud =
      rating > 0 ? BL_LOUD : (rating < 0 ? BL_CALM : BL_UNKNOWN);
  return current_song->calm_or_loud;
}

float bl_amplitude_sort(struct bl_song const *const song) {
  PyObject *res = call_helper("amplitude", song, false);
  if (!res) return BL_UNEXPECTED;
  PyGILState_STATE gs = PyGILState_Ensure();
  float v = (float)PyFloat_AsDouble(res);
  Py_DECREF(res);
  PyGILState_Release(gs);
  return v;
}

float bl_frequency_sort(struct bl_song const *const song) {
  PyObject *res = call_helper("frequency", song, false);
  if (!res) return BL_UNEXPECTED;
  PyGILState_STATE gs = PyGILState_Ensure();
  float v = (float)PyFloat_AsDouble(res);
  Py_DECREF(res);
  PyGILState_Release(gs);
  return v;
}

void bl_envelope_sort(struct bl_song const *const song,
                      struct envelope_result_s *result) {
  PyObject *res = call_helper("envelope", song, true);
  if (!res) {
    result->tempo = result->attack = BL_UNEXPECTED;
    return;
  }
  result->tempo = (float)tuple_item(res, 0);
  result->attack = (float)tuple_item(res, 1);
  drop(res);
}

float bl_distance(struct force_vector_s v1, struct force_vector_s v2) {
  return vec_distance(v1, v2);
}

float bl_cosine_similarity(struct force_vector_s v1,
                           struct force_vector_s v2) {
  return vec_cosine(v1, v2);
}

float bl_distance_file(char const *const f1, char const *const f2,
                       struct bl_song *s1, struct bl_song *s2) {
  if (bl_analyze(f1, s1) == BL_UNEXPECTED ||
      bl_analyze(f2, s2) == BL_UNEXPECTED)
    return BL_UNEXPECTED;
  return vec_distance(s1->force_vector, s2->force_vector);
}

float bl_cosine_similarity_file(char const *const f1, char const *const f2,
                                struct bl_song *s1, struct bl_song *s2) {
  if (bl_analyze(f1, s1) == BL_UNEXPECTED ||
      bl_analyze(f2, s2) == BL_UNEXPECTED)
    return BL_UNEXPECTED;
  return vec_cosine(s1->force_vector, s2->force_vector);
}

float bl_version(void) {
  printf("Using bliss analyzer version %0.1f.\n", BL_VERSION);
  return (float)BL_VERSION;
}

int bl_mean(int16_t *sample_array, int nSamples) {
  int acc = 0;
  for (int i = 0; i < nSamples; ++i) acc += sample_array[i];
  return acc / nSamples;
}

int bl_variance(int16_t *sample_array, int nSamples, int mean) {
  int64_t acc = 0;
  for (int i = 0; i < nSamples; ++i) {
    int32_t d = sample_array[i] - mean;
    acc += (int64_t)d * d;
  }
  return (int)(acc / nSamples);
}

void bl_rectangular_filter(double *out, double *in, int nSamples,
                           int smooth_width) {
  // Same semantics as the reference's running-mean filter, including the
  // edge slots (reference: src/tempo_atk_sort.c:19-40): interior slots get
  // centered box sums, slot n-half accumulates the tail sum, everything is
  // divided by the width.
  int half = (int)lround(smooth_width / 2.0);
  double acc = 0;
  for (int i = 0; i < smooth_width && i < nSamples; ++i) acc += in[i];
  for (int i = 0; i + smooth_width < nSamples + 1; ++i) {
    if (i + half - 1 < nSamples && i < nSamples - smooth_width)
      out[i + half - 1] = acc;
    if (i + smooth_width < nSamples) {
      acc -= in[i];
      acc += in[i + smooth_width];
    }
  }
  double tail = 0;
  for (int k = nSamples - smooth_width; k < nSamples; ++k)
    if (k >= 0) tail += in[k];
  if (nSamples - half >= 0) out[nSamples - half] += tail;
  for (int i = 0; i < nSamples; ++i) out[i] /= smooth_width;
}

}  // extern "C"
