// In-process libav demux/decode/encode bridge.
//
// Native successor of the reference's decoder plugin family
// (/root/reference/lives-plugins/plugins/decoders/: avformat, mkv, mpegts,
// asf, flv, ogg, dv — decplugin.h contract) and of its Perl encoder plugins
// (plugins/encoders/ffmpeg_encoder et al.). Those dlopen libavcodec
// per-format; here ONE bridge links libavformat/libavcodec directly and the
// Python side (lives_tpu/io/av.py) keeps the decplugin semantics:
//   get_clip_data -> avb_open + avb_info   (cdata: geometry/fps/frames)
//   get_frame     -> avb_get_frame          (I420 planes into caller buffer)
//   rip_audio     -> avb_rip_audio          (s16 interleaved pcm file)
//   estimate_delay-> avb_seek_cost          (keyframe-distance seek model,
//                                            decplugin.h:305 / adv_timing)
//
// Like mkv_decoder.c, the whole container is index-scanned once at open
// (packet pts + keyframe flags, no decoding) so frame count is exact and
// seeks land on the right GOP. Decoding keeps a warm decoder positioned
// after the last delivered frame: sequential access never seeks.
//
// C ABI, consumed via ctypes.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct LogQuiet {
  LogQuiet() { av_log_set_level(AV_LOG_ERROR); }
} log_quiet_;

struct Dec {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* vctx = nullptr;
  SwsContext* sws = nullptr;
  int vstream = -1;
  int astream = -1;
  // presentation-ordered packet index (built at open)
  std::vector<int64_t> pts;       // sorted pts per frame
  std::vector<int64_t> keyframes; // sorted pts of keyframes
  int64_t last_pts = INT64_MIN;   // pts of last delivered frame
  bool warm = false;              // decoder positioned just after last_pts
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
};

int64_t kf_before(const Dec* d, int64_t target_pts) {
  auto it = std::upper_bound(d->keyframes.begin(), d->keyframes.end(),
                             target_pts);
  if (it == d->keyframes.begin()) return d->pts.empty() ? 0 : d->pts[0];
  return *(it - 1);
}

int64_t frame_of_pts(const Dec* d, int64_t p) {
  auto it = std::lower_bound(d->pts.begin(), d->pts.end(), p);
  return it - d->pts.begin();
}

}  // namespace

extern "C" {

// no_index: skip the open-time packet scan (live/network streams have no
// end; frames are then served strictly sequentially via avb_next_frame).
void* avb_open_mode(const char* uri, int no_index) {
  Dec* d = new Dec();
  avformat_network_init();
  if (avformat_open_input(&d->fmt, uri, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  const AVCodec* vcodec = nullptr;
  d->vstream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                   &vcodec, 0);
  d->astream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                   nullptr, 0);
  if (d->astream < 0) d->astream = -1;
  if (d->vstream < 0 || !vcodec) {
    // audio-only containers are still openable (rip_audio path)
    if (d->astream < 0) {
      avformat_close_input(&d->fmt);
      delete d;
      return nullptr;
    }
    d->vstream = -1;
  } else {
    d->vctx = avcodec_alloc_context3(vcodec);
    avcodec_parameters_to_context(d->vctx,
                                  d->fmt->streams[d->vstream]->codecpar);
    d->vctx->thread_count = 1;  // single host core in this image
    if (avcodec_open2(d->vctx, vcodec, nullptr) < 0) {
      avcodec_free_context(&d->vctx);
      avformat_close_input(&d->fmt);
      delete d;
      return nullptr;
    }
  }
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();
  // index scan: every video packet's pts + keyframe flag (no decode)
  if (d->vstream >= 0 && !no_index) {
    while (av_read_frame(d->fmt, d->pkt) >= 0) {
      if (d->pkt->stream_index == d->vstream) {
        int64_t p = d->pkt->pts != AV_NOPTS_VALUE ? d->pkt->pts
                                                  : d->pkt->dts;
        d->pts.push_back(p);
        if (d->pkt->flags & AV_PKT_FLAG_KEY) d->keyframes.push_back(p);
      }
      av_packet_unref(d->pkt);
    }
    std::sort(d->pts.begin(), d->pts.end());
    std::sort(d->keyframes.begin(), d->keyframes.end());
    av_seek_frame(d->fmt, d->vstream, d->pts.empty() ? 0 : d->pts[0],
                  AVSEEK_FLAG_BACKWARD);
  }
  return d;
}

void* avb_open(const char* uri) { return avb_open_mode(uri, 0); }

// Sequential decode of the NEXT frame (live-stream mode; also works on
// indexed files). Returns 1 on success, 0 on EOF/error.
int avb_next_frame(void* h, uint8_t* dst) {
  Dec* d = static_cast<Dec*>(h);
  if (!d || d->vstream < 0) return 0;
  int w = d->vctx->width & ~1, hh = d->vctx->height & ~1;
  while (true) {
    int ret = avcodec_receive_frame(d->vctx, d->frame);
    if (ret == 0) {
      uint8_t* planes[3] = {dst, dst + (size_t)w * hh,
                            dst + (size_t)w * hh +
                                (size_t)(w / 2) * (hh / 2)};
      int strides[3] = {w, w / 2, w / 2};
      if (d->frame->format == AV_PIX_FMT_YUV420P ||
          d->frame->format == AV_PIX_FMT_YUVJ420P) {
        av_image_copy(planes, strides, (const uint8_t**)d->frame->data,
                      d->frame->linesize, AV_PIX_FMT_YUV420P, w, hh);
      } else {
        if (!d->sws)
          d->sws = sws_getContext(w, hh, (AVPixelFormat)d->frame->format,
                                  w, hh, AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                  nullptr, nullptr, nullptr);
        if (!d->sws) {
          av_frame_unref(d->frame);
          return 0;
        }
        sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, hh,
                  planes, strides);
      }
      av_frame_unref(d->frame);
      return 1;
    }
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return 0;
    while (true) {
      int r2 = av_read_frame(d->fmt, d->pkt);
      if (r2 < 0) {
        avcodec_send_packet(d->vctx, nullptr);
        break;
      }
      if (d->pkt->stream_index == d->vstream) {
        avcodec_send_packet(d->vctx, d->pkt);
        av_packet_unref(d->pkt);
        break;
      }
      av_packet_unref(d->pkt);
    }
  }
}

// info: out[0]=width out[1]=height out[2..3]=fps num/den out[4]=nframes
// out[5]=has_audio out[6]=arate out[7]=achans out[8]=interlaced
// out[9]=full_range(1=jpeg/unclamped) out[10]=bt709
int avb_info(void* h, int64_t* out) {
  Dec* d = static_cast<Dec*>(h);
  if (!d) return 0;
  AVRational fr = {25, 1};
  int w = 0, hgt = 0, interlaced = 0, full = 0, bt709 = 0;
  if (d->vstream >= 0) {
    AVStream* vs = d->fmt->streams[d->vstream];
    fr = vs->avg_frame_rate.num ? vs->avg_frame_rate : vs->r_frame_rate;
    // even-floored: I420 chroma planes are ceil(w/2) in libav but the
    // caller's contiguous buffer uses floor; report/copy the even region
    w = d->vctx->width & ~1;
    hgt = d->vctx->height & ~1;
    interlaced = vs->codecpar->field_order > AV_FIELD_PROGRESSIVE ? 1 : 0;
    full = d->vctx->color_range == AVCOL_RANGE_JPEG ? 1 : 0;
    bt709 = d->vctx->colorspace == AVCOL_SPC_BT709 ? 1 : 0;
  }
  int64_t arate = 0, achans = 0;
  if (d->astream >= 0) {
    AVCodecParameters* ap = d->fmt->streams[d->astream]->codecpar;
    arate = ap->sample_rate;
    achans = ap->ch_layout.nb_channels;
  }
  out[0] = w;
  out[1] = hgt;
  out[2] = fr.num ? fr.num : 25;
  out[3] = fr.den ? fr.den : 1;
  out[4] = (int64_t)d->pts.size();
  out[5] = d->astream >= 0 ? 1 : 0;
  out[6] = arate;
  out[7] = achans;
  out[8] = interlaced;
  out[9] = full;
  out[10] = bt709;
  return 1;
}

const char* avb_codec_name(void* h) {
  Dec* d = static_cast<Dec*>(h);
  if (!d || d->vstream < 0) return "";
  return avcodec_get_name(d->fmt->streams[d->vstream]->codecpar->codec_id);
}

// decplugin estimate_delay analogue: packets that must be decoded to show
// frame `to` when currently positioned after frame `from` (-1 = cold).
int64_t avb_seek_cost(void* h, int64_t from, int64_t to) {
  Dec* d = static_cast<Dec*>(h);
  if (!d || to < 0 || to >= (int64_t)d->pts.size()) return 1 << 20;
  if (from >= 0 && to > from && d->pts.size() &&
      to - from < 64)  // forward continuation window
    return to - from;
  int64_t kf = frame_of_pts(d, kf_before(d, d->pts[to]));
  return to - kf + 1;
}

// Decode frame n into dst (I420: w*h luma + 2*(w/2*h/2) chroma, contiguous,
// even dims rounded down like the reference's I420 handling).
int avb_get_frame(void* h, int64_t n, uint8_t* dst) {
  Dec* d = static_cast<Dec*>(h);
  if (!d || d->vstream < 0 || n < 0 || n >= (int64_t)d->pts.size())
    return 0;
  int64_t target = d->pts[n];
  bool seq = d->warm && target > d->last_pts &&
             frame_of_pts(d, target) - frame_of_pts(d, d->last_pts) < 64;
  if (!seq) {
    av_seek_frame(d->fmt, d->vstream, kf_before(d, target),
                  AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(d->vctx);
  }
  int w = d->vctx->width & ~1, hh = d->vctx->height & ~1;
  while (true) {
    int ret = avcodec_receive_frame(d->vctx, d->frame);
    if (ret == 0) {
      int64_t p = d->frame->best_effort_timestamp != AV_NOPTS_VALUE
                      ? d->frame->best_effort_timestamp
                      : d->frame->pts;
      if (p >= target || p == AV_NOPTS_VALUE) {
        // convert/copy to I420
        uint8_t* planes[3] = {dst, dst + (size_t)w * hh,
                              dst + (size_t)w * hh +
                                  (size_t)(w / 2) * (hh / 2)};
        int strides[3] = {w, w / 2, w / 2};
        if (d->frame->format == AV_PIX_FMT_YUV420P ||
            d->frame->format == AV_PIX_FMT_YUVJ420P) {
          av_image_copy(planes, strides,
                        (const uint8_t**)d->frame->data,
                        d->frame->linesize, AV_PIX_FMT_YUV420P, w, hh);
        } else {
          if (!d->sws)
            d->sws = sws_getContext(w, hh, (AVPixelFormat)d->frame->format,
                                    w, hh, AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                    nullptr, nullptr, nullptr);
          if (!d->sws) {
            av_frame_unref(d->frame);
            return 0;
          }
          sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, hh,
                    planes, strides);
        }
        d->last_pts = p;
        d->warm = true;
        av_frame_unref(d->frame);
        return 1;
      }
      av_frame_unref(d->frame);
      continue;
    }
    if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) return 0;
    if (ret == AVERROR_EOF) return 0;
    // feed the next video packet
    while (true) {
      int r2 = av_read_frame(d->fmt, d->pkt);
      if (r2 < 0) {
        avcodec_send_packet(d->vctx, nullptr);  // flush
        break;
      }
      if (d->pkt->stream_index == d->vstream) {
        avcodec_send_packet(d->vctx, d->pkt);
        av_packet_unref(d->pkt);
        break;
      }
      av_packet_unref(d->pkt);
    }
  }
}

// Decode the audio stream to interleaved s16le pcm at native rate/chans.
// Returns samples-per-channel written, or -1. (decplugin rip_audio :294.)
int64_t avb_rip_audio(void* h, const char* out_path) {
  Dec* d = static_cast<Dec*>(h);
  if (!d || d->astream < 0) return -1;
  AVStream* as = d->fmt->streams[d->astream];
  const AVCodec* ac = avcodec_find_decoder(as->codecpar->codec_id);
  if (!ac) return -1;
  AVCodecContext* actx = avcodec_alloc_context3(ac);
  avcodec_parameters_to_context(actx, as->codecpar);
  if (avcodec_open2(actx, ac, nullptr) < 0) {
    avcodec_free_context(&actx);
    return -1;
  }
  SwrContext* swr = nullptr;
  AVChannelLayout outl;
  av_channel_layout_copy(&outl, &actx->ch_layout);
  swr_alloc_set_opts2(&swr, &outl, AV_SAMPLE_FMT_S16, actx->sample_rate,
                      &actx->ch_layout, actx->sample_fmt, actx->sample_rate,
                      0, nullptr);
  if (!swr || swr_init(swr) < 0) {
    avcodec_free_context(&actx);
    return -1;
  }
  FILE* fh = fopen(out_path, "wb");
  if (!fh) {
    swr_free(&swr);
    avcodec_free_context(&actx);
    return -1;
  }
  av_seek_frame(d->fmt, d->astream, 0, AVSEEK_FLAG_BACKWARD);
  AVFrame* fr = av_frame_alloc();
  AVPacket* pk = av_packet_alloc();
  int64_t total = 0;
  int chans = actx->ch_layout.nb_channels;
  std::vector<int16_t> buf;
  bool eof = false;
  while (!eof) {
    int r = av_read_frame(d->fmt, pk);
    if (r < 0) {
      avcodec_send_packet(actx, nullptr);
      eof = true;
    } else if (pk->stream_index != d->astream) {
      av_packet_unref(pk);
      continue;
    } else {
      avcodec_send_packet(actx, pk);
      av_packet_unref(pk);
    }
    while (avcodec_receive_frame(actx, fr) == 0) {
      int outn = fr->nb_samples + 256;
      buf.resize((size_t)outn * chans);
      uint8_t* outp = (uint8_t*)buf.data();
      int got = swr_convert(swr, &outp, outn,
                            (const uint8_t**)fr->extended_data,
                            fr->nb_samples);
      if (got > 0) {
        fwrite(buf.data(), sizeof(int16_t) * chans, got, fh);
        total += got;
      }
      av_frame_unref(fr);
    }
  }
  fclose(fh);
  av_frame_free(&fr);
  av_packet_free(&pk);
  swr_free(&swr);
  avcodec_free_context(&actx);
  // restore video positioning
  if (d->vstream >= 0 && !d->pts.empty()) {
    av_seek_frame(d->fmt, d->vstream, d->pts[0], AVSEEK_FLAG_BACKWARD);
    if (d->vctx) avcodec_flush_buffers(d->vctx);
    d->warm = false;
  }
  return total;
}

void avb_close(void* h) {
  Dec* d = static_cast<Dec*>(h);
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->vctx) avcodec_free_context(&d->vctx);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

// ---------------------------------------------------------------------------
// Encoder (reference encoder-plugin capability: ffmpeg_encoder family)
// ---------------------------------------------------------------------------

struct Enc {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  AVStream* vs = nullptr;
  AVStream* as = nullptr;
  SwrContext* swr = nullptr;
  SwsContext* sws = nullptr;   // RGB24 -> codec pix_fmt when needed
  AVFrame* vframe = nullptr;
  AVFrame* aframe = nullptr;
  int64_t vpts = 0;
  int64_t apts = 0;            // in samples
  std::vector<int16_t> apend;  // pending samples (chunk to frame_size)
  int w = 0, h = 0, arate = 0, achans = 0;
  bool header = false;
};

static int enc_write(Enc* e, AVCodecContext* c, AVStream* s, AVFrame* f) {
  if (avcodec_send_frame(c, f) < 0) return 0;
  AVPacket* pk = av_packet_alloc();
  while (avcodec_receive_packet(c, pk) == 0) {
    av_packet_rescale_ts(pk, c->time_base, s->time_base);
    pk->stream_index = s->index;
    av_interleaved_write_frame(e->fmt, pk);
  }
  av_packet_free(&pk);
  return 1;
}

// fmt_name: explicit container/muxer ("mpegts", "ogg", ...) for
// extension-less targets (network URLs: udp://, icecast://, rtp://);
// empty = guess from path.
void* avb_enc_open2(const char* path, const char* fmt_name,
                    const char* vcodec_name, int w, int h,
                    int fps_num, int fps_den, int64_t bitrate, int gop,
                    const char* acodec_name, int arate, int achans) {
  Enc* e = new Enc();
  e->w = w;
  e->h = h;
  avformat_network_init();
  if (avformat_alloc_output_context2(
          &e->fmt, nullptr, fmt_name && *fmt_name ? fmt_name : nullptr,
          path) < 0 || !e->fmt) {
    delete e;
    return nullptr;
  }
  if (vcodec_name && *vcodec_name && w > 0) {
    const AVCodec* vc = avcodec_find_encoder_by_name(vcodec_name);
    if (!vc) goto fail;
    e->vctx = avcodec_alloc_context3(vc);
    e->vctx->width = w;
    e->vctx->height = h;
    e->vctx->time_base = {fps_den, fps_num};
    e->vctx->framerate = {fps_num, fps_den};
    e->vctx->pix_fmt =
        vc->pix_fmts ? vc->pix_fmts[0] : AV_PIX_FMT_YUV420P;
    e->vctx->gop_size = gop > 0 ? gop : 12;
    if (bitrate > 0) e->vctx->bit_rate = bitrate;
    if (!strcmp(vcodec_name, "libx264")) {
      av_opt_set(e->vctx->priv_data, "preset", "veryfast", 0);
      if (bitrate <= 0) av_opt_set(e->vctx->priv_data, "crf", "20", 0);
    }
    if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
      e->vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(e->vctx, vc, nullptr) < 0) goto fail;
    e->vs = avformat_new_stream(e->fmt, nullptr);
    avcodec_parameters_from_context(e->vs->codecpar, e->vctx);
    e->vs->time_base = e->vctx->time_base;
    e->vframe = av_frame_alloc();
    e->vframe->format = e->vctx->pix_fmt;
    e->vframe->width = w;
    e->vframe->height = h;
    av_frame_get_buffer(e->vframe, 0);
  }
  if (acodec_name && *acodec_name && arate > 0) {
    const AVCodec* ac = avcodec_find_encoder_by_name(acodec_name);
    if (!ac) goto fail;
    e->actx = avcodec_alloc_context3(ac);
    e->actx->sample_rate = arate;
    av_channel_layout_default(&e->actx->ch_layout, achans);
    e->actx->sample_fmt =
        ac->sample_fmts ? ac->sample_fmts[0] : AV_SAMPLE_FMT_S16;
    e->actx->time_base = {1, arate};
    if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
      e->actx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(e->actx, ac, nullptr) < 0) goto fail;
    e->as = avformat_new_stream(e->fmt, nullptr);
    avcodec_parameters_from_context(e->as->codecpar, e->actx);
    e->as->time_base = e->actx->time_base;
    e->arate = arate;
    e->achans = achans;
    AVChannelLayout s16l;
    av_channel_layout_default(&s16l, achans);
    swr_alloc_set_opts2(&e->swr, &e->actx->ch_layout, e->actx->sample_fmt,
                        arate, &s16l, AV_SAMPLE_FMT_S16, arate, 0, nullptr);
    if (!e->swr || swr_init(e->swr) < 0) goto fail;
    e->aframe = av_frame_alloc();
    e->aframe->format = e->actx->sample_fmt;
    e->aframe->nb_samples =
        e->actx->frame_size > 0 ? e->actx->frame_size : 1024;
    av_channel_layout_copy(&e->aframe->ch_layout, &e->actx->ch_layout);
    av_frame_get_buffer(e->aframe, 0);
  }
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE) < 0) goto fail;
  }
  if (avformat_write_header(e->fmt, nullptr) < 0) goto fail;
  e->header = true;
  return e;
fail:
  if (e->vctx) avcodec_free_context(&e->vctx);
  if (e->actx) avcodec_free_context(&e->actx);
  if (e->fmt) avformat_free_context(e->fmt);
  delete e;
  return nullptr;
}

void* avb_enc_open(const char* path, const char* vcodec_name, int w, int h,
                   int fps_num, int fps_den, int64_t bitrate, int gop,
                   const char* acodec_name, int arate, int achans) {
  return avb_enc_open2(path, "", vcodec_name, w, h, fps_num, fps_den,
                       bitrate, gop, acodec_name, arate, achans);
}

// src: I420 contiguous (w*h + 2*(w/2)*(h/2)). is_rgb: src is RGB24 packed.
int avb_enc_video(void* h, const uint8_t* src, int is_rgb) {
  Enc* e = static_cast<Enc*>(h);
  if (!e || !e->vctx) return 0;
  av_frame_make_writable(e->vframe);
  int w = e->w, hh = e->h;
  AVPixelFormat sfmt = is_rgb ? AV_PIX_FMT_RGB24 : AV_PIX_FMT_YUV420P;
  const uint8_t* splanes[3] = {src, src + (size_t)w * hh,
                               src + (size_t)w * hh +
                                   (size_t)(w / 2) * (hh / 2)};
  int sstrides[3] = {is_rgb ? 3 * w : w, w / 2, w / 2};
  if (sfmt == e->vctx->pix_fmt && !is_rgb) {
    av_image_copy(e->vframe->data, e->vframe->linesize, splanes, sstrides,
                  AV_PIX_FMT_YUV420P, w, hh);
  } else {
    if (!e->sws)
      e->sws = sws_getContext(w, hh, sfmt, w, hh, e->vctx->pix_fmt,
                              SWS_BILINEAR, nullptr, nullptr, nullptr);
    sws_scale(e->sws, splanes, sstrides, 0, hh, e->vframe->data,
              e->vframe->linesize);
  }
  e->vframe->pts = e->vpts++;
  return enc_write(e, e->vctx, e->vs, e->vframe);
}

int avb_enc_audio(void* h, const int16_t* pcm, int64_t nsamples) {
  Enc* e = static_cast<Enc*>(h);
  if (!e || !e->actx) return 0;
  e->apend.insert(e->apend.end(), pcm, pcm + nsamples * e->achans);
  int fsz = e->aframe->nb_samples;
  while ((int64_t)e->apend.size() >= (int64_t)fsz * e->achans) {
    av_frame_make_writable(e->aframe);
    const uint8_t* in = (const uint8_t*)e->apend.data();
    swr_convert(e->swr, e->aframe->data, fsz, &in, fsz);
    e->aframe->pts = e->apts;
    e->apts += fsz;
    enc_write(e, e->actx, e->as, e->aframe);
    e->apend.erase(e->apend.begin(), e->apend.begin() + (size_t)fsz * e->achans);
  }
  return 1;
}

int avb_enc_close(void* h) {
  Enc* e = static_cast<Enc*>(h);
  if (!e) return 0;
  int ok = 1;
  if (e->header) {
    // flush pending audio (pad the tail frame with silence)
    if (e->actx && !e->apend.empty()) {
      int fsz = e->aframe->nb_samples;
      e->apend.resize((size_t)fsz * e->achans, 0);
      const uint8_t* in = (const uint8_t*)e->apend.data();
      av_frame_make_writable(e->aframe);
      swr_convert(e->swr, e->aframe->data, fsz, &in, fsz);
      e->aframe->pts = e->apts;
      enc_write(e, e->actx, e->as, e->aframe);
    }
    if (e->vctx) enc_write(e, e->vctx, e->vs, nullptr);
    if (e->actx) enc_write(e, e->actx, e->as, nullptr);
    av_write_trailer(e->fmt);
  }
  if (e->fmt && !(e->fmt->oformat->flags & AVFMT_NOFILE) && e->fmt->pb)
    avio_closep(&e->fmt->pb);
  if (e->sws) sws_freeContext(e->sws);
  if (e->swr) swr_free(&e->swr);
  if (e->vframe) av_frame_free(&e->vframe);
  if (e->aframe) av_frame_free(&e->aframe);
  if (e->vctx) avcodec_free_context(&e->vctx);
  if (e->actx) avcodec_free_context(&e->actx);
  if (e->fmt) avformat_free_context(e->fmt);
  delete e;
  return ok;
}

int avb_have_encoder(const char* name) {
  return avcodec_find_encoder_by_name(name) ? 1 : 0;
}

}  // extern "C"
