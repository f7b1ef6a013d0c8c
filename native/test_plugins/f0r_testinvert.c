/* Minimal frei0r 1.x test plugin (RGBA invert with an `amount` mix):
   compiled by tests/test_bridges.py so the ctypes frei0r host
   (lives_tpu/effects/frei0r.py) is exercised against a REAL .so in CI —
   the container ships no frei0r plugins. API per frei0r.h 1.x. */
#include <stdint.h>
#include <stdlib.h>

typedef struct {
  const char *name, *author;
  int plugin_type, color_model, frei0r_version, major_version,
      minor_version, num_params;
  const char *explanation;
} f0r_plugin_info_t;

typedef struct {
  const char *name;
  int type;
  const char *explanation;
} f0r_param_info_t;

typedef struct { unsigned w, h; double amount; } inst_t;

int f0r_init(void) { return 1; }
void f0r_deinit(void) {}

void f0r_get_plugin_info(f0r_plugin_info_t *i) {
  i->name = "testinvert";
  i->author = "lives_tpu";
  i->plugin_type = 0;      /* F0R_PLUGIN_TYPE_FILTER */
  i->color_model = 1;      /* F0R_COLOR_MODEL_RGBA8888 */
  i->frei0r_version = 1;
  i->major_version = 1;
  i->minor_version = 0;
  i->num_params = 1;
  i->explanation = "invert RGB, alpha preserved";
}

void f0r_get_param_info(f0r_param_info_t *p, int idx) {
  (void)idx;
  p->name = "amount";
  p->type = 1;             /* F0R_PARAM_DOUBLE */
  p->explanation = "mix";
}

void *f0r_construct(unsigned w, unsigned h) {
  inst_t *s = (inst_t *)malloc(sizeof *s);
  s->w = w; s->h = h; s->amount = 1.0;
  return s;
}

void f0r_destruct(void *h) { free(h); }

void f0r_set_param_value(void *h, void *v, int idx) {
  (void)idx;
  ((inst_t *)h)->amount = *(double *)v;
}

void f0r_get_param_value(void *h, void *v, int idx) {
  (void)idx;
  *(double *)v = ((inst_t *)h)->amount;
}

void f0r_update(void *h, double t, const uint32_t *in, uint32_t *out) {
  (void)t;
  inst_t *s = (inst_t *)h;
  const uint8_t *pi = (const uint8_t *)in;
  uint8_t *po = (uint8_t *)out;
  double a = s->amount;
  unsigned n = s->w * s->h;
  for (unsigned i = 0; i < n; i++) {
    for (int c = 0; c < 3; c++) {
      double orig = pi[4 * i + c];
      po[4 * i + c] = (uint8_t)(orig + ((255.0 - orig) - orig) * a + 0.5);
    }
    po[4 * i + 3] = pi[4 * i + 3];
  }
}
