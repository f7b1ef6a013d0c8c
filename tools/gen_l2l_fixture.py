#!/usr/bin/env python
"""Generate golden L2L stream fixtures from the REFERENCE packetiser.

Compiles `/root/reference/lives-plugins/plugins/playback/video/
lives2lives_stream.c` VERBATIM (with a minimal type prelude replacing the
weed/lives plugin header stack) into a harness that streams 3 synthetic
frames over UDP to localhost; the datagrams are captured in order and
concatenated into `tests/fixtures/l2l_ref_{yuv420,rgb24}.bin`.

The committed fixtures prove byte-level interop: `lives_tpu.stream`'s
receiver must decode frames produced by actual reference code, not just
by our own sender (VERDICT r4 item 5). Re-run this tool only when the
reference tree is available; tests consume the committed bytes.
"""

import shutil
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REF = Path("/root/reference/lives-plugins/plugins/playback/video")
REPO = Path(__file__).resolve().parent.parent

PRELUDE = """\
#ifndef L2L_PRELUDE_H
#define L2L_PRELUDE_H
#include <weed-palettes.h>
typedef int boolean;
#ifndef TRUE
#define TRUE 1
#define FALSE 0
#endif
typedef void pl_intentcap;
#define __VIDPLUGIN_H__ 1
#define _LIVES_PLUGIN_H_ 1
#endif
"""

HARNESS = """\
#include "lives2lives_stream.c"

int main(int argc, char **argv) {
  int w = 32, h = 24, f, i;
  int pal = (argc > 2 && argv[2][0] == 'r') ? WEED_PALETTE_RGB24
                                            : WEED_PALETTE_YUV420P;
  char *av[5] = {"127", "0", "0", "1", argv[1]};
  module_check_init();
  set_palette(pal);
  set_fps(25.0);
  if (!init_screen(w, h, 0, 0, 5, av)) return 1;
  unsigned char *y = malloc(w * h * 3), *u = malloc(w * h / 4),
                *v = malloc(w * h / 4);
  void *pd[3] = {y, u, v};
  for (f = 0; f < 3; f++) {
    int n = (pal == WEED_PALETTE_RGB24) ? w * h * 3 : w * h;
    for (i = 0; i < n; i++) y[i] = (i * 7 + f * 31) % 240 + 16;
    for (i = 0; i < w * h / 4; i++) {
      u[i] = (i * 3 + f) % 225 + 16;
      v[i] = (i * 5 + f * 2) % 225 + 16;
    }
    usleep(50000);
    render_frame_stream(w, h, f * 4000000LL, pd);
  }
  usleep(50000);
  exit_screen(0, 0);
  return 0;
}
"""


def build(tmp: Path) -> Path:
    (tmp / "prelude.h").write_text(PRELUDE)
    (tmp / "harness.c").write_text(HARNESS)
    exe = tmp / "harness"
    subprocess.run(
        ["gcc", "-o", str(exe), str(tmp / "harness.c"),
         "-include", str(tmp / "prelude.h"),
         "-I", str(REF), "-I", "/root/reference/libweed"],
        check=True)
    return exe


def capture(exe: Path, mode: str) -> bytes:
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(5.0)
    port = sock.getsockname()[1]
    proc = subprocess.Popen([str(exe), str(port), mode])
    chunks = []
    try:
        while True:
            data, _ = sock.recvfrom(65536)
            chunks.append(data)
            if data.endswith(b"STREND"):
                break
    finally:
        proc.wait(timeout=10)
        sock.close()
    return b"".join(chunks)


def main():
    if not REF.is_dir():
        sys.exit("reference tree not available; fixtures are committed")
    out = REPO / "tests" / "fixtures"
    out.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(prefix="l2lfix_"))
    try:
        exe = build(tmp)
        for mode, name in (("y", "l2l_ref_yuv420.bin"),
                           ("r", "l2l_ref_rgb24.bin")):
            blob = capture(exe, mode)
            (out / name).write_bytes(blob)
            print(name, len(blob), "bytes")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
