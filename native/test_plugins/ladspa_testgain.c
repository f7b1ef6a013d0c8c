/* Minimal LADSPA 1.1 test plugin (mono gain): compiled by
   tests/test_bridges.py so the ctypes LADSPA host
   (lives_tpu/audio/ladspa.py) is exercised against a REAL .so in CI.
   ABI per ladspa.h. */
#include <stdlib.h>

typedef float LADSPA_Data;
typedef void *LADSPA_Handle;

typedef struct {
  int HintDescriptor;
  LADSPA_Data LowerBound, UpperBound;
} LADSPA_PortRangeHint;

typedef struct _LADSPA_Descriptor {
  unsigned long UniqueID;
  const char *Label;
  int Properties;
  const char *Name, *Maker, *Copyright;
  unsigned long PortCount;
  const int *PortDescriptors;
  const char *const *PortNames;
  const LADSPA_PortRangeHint *PortRangeHints;
  void *ImplementationData;
  LADSPA_Handle (*instantiate)(const struct _LADSPA_Descriptor *,
                               unsigned long);
  void (*connect_port)(LADSPA_Handle, unsigned long, LADSPA_Data *);
  void (*activate)(LADSPA_Handle);
  void (*run)(LADSPA_Handle, unsigned long);
  void (*run_adding)(LADSPA_Handle, unsigned long);
  void (*set_run_adding_gain)(LADSPA_Handle, LADSPA_Data);
  void (*deactivate)(LADSPA_Handle);
  void (*cleanup)(LADSPA_Handle);
} LADSPA_Descriptor;

typedef struct {
  LADSPA_Data *gain, *in, *out;
} gain_t;

static LADSPA_Handle g_inst(const LADSPA_Descriptor *d, unsigned long rate) {
  (void)d; (void)rate;
  return calloc(1, sizeof(gain_t));
}

static void g_connect(LADSPA_Handle h, unsigned long port,
                      LADSPA_Data *loc) {
  gain_t *g = (gain_t *)h;
  if (port == 0) g->gain = loc;
  else if (port == 1) g->in = loc;
  else g->out = loc;
}

static void g_run(LADSPA_Handle h, unsigned long n) {
  gain_t *g = (gain_t *)h;
  LADSPA_Data k = g->gain ? *g->gain : 1.0f;
  for (unsigned long i = 0; i < n; i++) g->out[i] = g->in[i] * k;
}

static void g_cleanup(LADSPA_Handle h) { free(h); }

static const int ports[3] = {0x1 | 0x4, 0x1 | 0x8, 0x2 | 0x8};
static const char *const names[3] = {"Gain", "Input", "Output"};
static const LADSPA_PortRangeHint hints[3] = {
  {0, 0.0f, 4.0f}, {0, 0, 0}, {0, 0, 0}};

static const LADSPA_Descriptor DESC = {
  424242, "testgain", 0, "Test Gain", "lives_tpu", "GPL",
  3, ports, names, hints, 0,
  g_inst, g_connect, 0, g_run, 0, 0, 0, g_cleanup};

const LADSPA_Descriptor *ladspa_descriptor(unsigned long idx) {
  return idx == 0 ? &DESC : 0;
}
