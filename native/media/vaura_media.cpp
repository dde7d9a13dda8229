// vaura_media: host-side media pipeline on libav (C++).
//
// TPU-native replacement for the reference's media substrate: PyAV/libav
// container parsing (reference utils/data_utils.py:197-328), torchvision
// read_video, the ffmpeg-subprocess re-encoder (scripts/reencode_videos.py:
// 19-26,63-78: 25 fps, min-side 256, h264 crf10 yuv420p, 44.1 kHz mono aac)
// and the PyAV muxer (utils/utils.py:52-136). Exposed as a C ABI consumed
// through ctypes (vaura_tpu/data/media.py); produces fixed-shape RGB frame
// and f32 mono audio buffers ready for jax.numpy.
//
// Decode path: demux -> h264/etc decode -> swscale RGB24 (optional resize,
// min-side rule) -> PTS-based fps resampling (nearest frame per target
// tick, like ffmpeg's fps filter) ; audio -> swresample to f32 mono at the
// target rate.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/channel_layout.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#define VM_OK 0
#define VM_ERR_OPEN -1
#define VM_ERR_STREAM -2
#define VM_ERR_DECODE -3
#define VM_ERR_ENCODE -4
#define VM_ERR_ARGS -5

static thread_local std::string g_last_error;

static int fail(int code, const std::string &msg) {
  g_last_error = msg;
  return code;
}

extern "C" {

const char *vm_last_error() { return g_last_error.c_str(); }

__attribute__((constructor)) static void vm_init_log() {
  av_log_set_level(AV_LOG_ERROR);
}

typedef struct {
  double duration;      // seconds (container)
  double video_fps;     // average frame rate
  int width, height;
  int audio_sample_rate;
  int audio_channels;
  int64_t n_video_frames;  // stream nb_frames (0 if unknown)
  int has_video, has_audio;
} VmProbe;

typedef struct {
  uint8_t *frames;  // [n_frames, height, width, 3] RGB24
  int64_t n_frames;
  int width, height;
  double fps;
  float *audio;  // [n_samples] mono f32
  int64_t n_samples;
  int sample_rate;
  double first_video_pts;  // seconds
} VmDecoded;

// --------------------------------------------------------------------- //
int vm_probe(const char *path, VmProbe *out) {
  std::memset(out, 0, sizeof(*out));
  AVFormatContext *fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
    return fail(VM_ERR_OPEN, std::string("cannot open ") + path);
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return fail(VM_ERR_STREAM, "no stream info");
  }
  out->duration = fmt->duration > 0 ? fmt->duration / (double)AV_TIME_BASE : 0.0;
  int vi = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  int ai = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (vi >= 0) {
    AVStream *vs = fmt->streams[vi];
    out->has_video = 1;
    out->width = vs->codecpar->width;
    out->height = vs->codecpar->height;
    out->n_video_frames = vs->nb_frames;
    AVRational fr = vs->avg_frame_rate;
    out->video_fps = fr.den > 0 ? av_q2d(fr) : 0.0;
  }
  if (ai >= 0) {
    AVStream *as = fmt->streams[ai];
    out->has_audio = 1;
    out->audio_sample_rate = as->codecpar->sample_rate;
    out->audio_channels = as->codecpar->ch_layout.nb_channels;
  }
  avformat_close_input(&fmt);
  return VM_OK;
}

// --------------------------------------------------------------------- //
struct DecoderCtx {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *vctx = nullptr;
  AVCodecContext *actx = nullptr;
  int vi = -1, ai = -1;
  ~DecoderCtx() {
    if (vctx) avcodec_free_context(&vctx);
    if (actx) avcodec_free_context(&actx);
    if (fmt) avformat_close_input(&fmt);
  }
};

static int open_decoder(const char *path, DecoderCtx &dc, bool want_video,
                        bool want_audio) {
  if (avformat_open_input(&dc.fmt, path, nullptr, nullptr) < 0)
    return fail(VM_ERR_OPEN, std::string("cannot open ") + path);
  if (avformat_find_stream_info(dc.fmt, nullptr) < 0)
    return fail(VM_ERR_STREAM, "no stream info");
  if (want_video) {
    dc.vi = av_find_best_stream(dc.fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (dc.vi >= 0) {
      const AVCodec *dec =
          avcodec_find_decoder(dc.fmt->streams[dc.vi]->codecpar->codec_id);
      if (!dec) return fail(VM_ERR_DECODE, "no video decoder");
      dc.vctx = avcodec_alloc_context3(dec);
      avcodec_parameters_to_context(dc.vctx, dc.fmt->streams[dc.vi]->codecpar);
      dc.vctx->thread_count = 0;  // auto
      if (avcodec_open2(dc.vctx, dec, nullptr) < 0)
        return fail(VM_ERR_DECODE, "cannot open video decoder");
    }
  }
  if (want_audio) {
    dc.ai = av_find_best_stream(dc.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (dc.ai >= 0) {
      const AVCodec *dec =
          avcodec_find_decoder(dc.fmt->streams[dc.ai]->codecpar->codec_id);
      if (!dec) return fail(VM_ERR_DECODE, "no audio decoder");
      dc.actx = avcodec_alloc_context3(dec);
      avcodec_parameters_to_context(dc.actx, dc.fmt->streams[dc.ai]->codecpar);
      if (avcodec_open2(dc.actx, dec, nullptr) < 0)
        return fail(VM_ERR_DECODE, "cannot open audio decoder");
    }
  }
  return VM_OK;
}

int vm_decode(const char *path, double start_sec, double max_duration_sec,
              double target_fps, int target_w, int target_h, int min_side,
              int target_sr, int want_video, int want_audio, VmDecoded *out) {
  std::memset(out, 0, sizeof(*out));
  DecoderCtx dc;
  int rc = open_decoder(path, dc, want_video, want_audio);
  if (rc != VM_OK) return rc;
  if (want_video && dc.vi < 0) want_video = 0;
  if (want_audio && dc.ai < 0) want_audio = 0;
  if (!want_video && !want_audio) return fail(VM_ERR_STREAM, "no usable streams");

  const double end_sec =
      max_duration_sec > 0 ? start_sec + max_duration_sec : 1e18;

  // seek near the start (keyframe before start)
  if (start_sec > 0) {
    int64_t ts = (int64_t)(start_sec * AV_TIME_BASE);
    av_seek_frame(dc.fmt, -1, ts, AVSEEK_FLAG_BACKWARD);
    if (dc.vctx) avcodec_flush_buffers(dc.vctx);
    if (dc.actx) avcodec_flush_buffers(dc.actx);
  }

  // ---- video geometry ----
  int src_w = dc.vctx ? dc.vctx->width : 0;
  int src_h = dc.vctx ? dc.vctx->height : 0;
  int dst_w = src_w, dst_h = src_h;
  if (want_video) {
    if (target_w > 0 && target_h > 0) {
      dst_w = target_w;
      dst_h = target_h;
    } else if (min_side > 0 && src_w > 0 && src_h > 0) {
      // min-side scaling, even dims (reencode_videos.py contract)
      if (src_w <= src_h) {
        dst_w = min_side;
        dst_h = (int)std::lround((double)src_h * min_side / src_w / 2) * 2;
      } else {
        dst_h = min_side;
        dst_w = (int)std::lround((double)src_w * min_side / src_h / 2) * 2;
      }
    }
  }

  SwsContext *sws = nullptr;
  SwrContext *swr = nullptr;
  std::vector<uint8_t> frames;
  std::vector<double> frame_pts;
  std::vector<float> audio;
  int out_sr = 0;
  double native_fps = 0;
  if (want_video) {
    AVRational fr = dc.fmt->streams[dc.vi]->avg_frame_rate;
    native_fps = fr.den > 0 ? av_q2d(fr) : 25.0;
  }

  AVPacket *pkt = av_packet_alloc();
  AVFrame *frm = av_frame_alloc();
  AVFrame *rgb = av_frame_alloc();
  bool video_done = !want_video, audio_done = !want_audio;
  double first_vpts = -1;

  auto handle_video_frame = [&](AVFrame *f) {
    AVRational tb = dc.fmt->streams[dc.vi]->time_base;
    double pts = f->pts == AV_NOPTS_VALUE ? -1 : f->pts * av_q2d(tb);
    if (pts >= 0 && pts < start_sec - 1e-9) return;
    if (pts > end_sec + 1e-9) {
      video_done = true;
      return;
    }
    if (!sws) {
      sws = sws_getContext(src_w, src_h, (AVPixelFormat)f->format, dst_w,
                           dst_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                           nullptr, nullptr);
      rgb->format = AV_PIX_FMT_RGB24;
      rgb->width = dst_w;
      rgb->height = dst_h;
      av_frame_get_buffer(rgb, 32);
    }
    sws_scale(sws, f->data, f->linesize, 0, src_h, rgb->data, rgb->linesize);
    size_t off = frames.size();
    frames.resize(off + (size_t)dst_w * dst_h * 3);
    for (int y = 0; y < dst_h; y++)
      std::memcpy(frames.data() + off + (size_t)y * dst_w * 3,
                  rgb->data[0] + (size_t)y * rgb->linesize[0],
                  (size_t)dst_w * 3);
    frame_pts.push_back(pts);
    if (first_vpts < 0) first_vpts = pts;
  };

  auto handle_audio_frame = [&](AVFrame *f) {
    AVRational tb = dc.fmt->streams[dc.ai]->time_base;
    double pts = f->pts == AV_NOPTS_VALUE ? -1 : f->pts * av_q2d(tb);
    if (pts > end_sec + 0.5) {
      audio_done = true;
      return;
    }
    if (!swr) {
      out_sr = target_sr > 0 ? target_sr : dc.actx->sample_rate;
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, out_sr,
                          &dc.actx->ch_layout, dc.actx->sample_fmt,
                          dc.actx->sample_rate, 0, nullptr);
      swr_init(swr);
    }
    int max_out = swr_get_out_samples(swr, f->nb_samples);
    size_t off = audio.size();
    audio.resize(off + max_out);
    uint8_t *outp = (uint8_t *)(audio.data() + off);
    int got = swr_convert(swr, &outp, max_out,
                          (const uint8_t **)f->extended_data, f->nb_samples);
    audio.resize(off + std::max(got, 0));
  };

  while ((!video_done || !audio_done) && av_read_frame(dc.fmt, pkt) >= 0) {
    if (want_video && pkt->stream_index == dc.vi && !video_done) {
      if (avcodec_send_packet(dc.vctx, pkt) >= 0)
        while (avcodec_receive_frame(dc.vctx, frm) >= 0) handle_video_frame(frm);
    } else if (want_audio && pkt->stream_index == dc.ai && !audio_done) {
      if (avcodec_send_packet(dc.actx, pkt) >= 0)
        while (avcodec_receive_frame(dc.actx, frm) >= 0) handle_audio_frame(frm);
    }
    av_packet_unref(pkt);
  }
  // flush decoders
  if (want_video && dc.vctx) {
    avcodec_send_packet(dc.vctx, nullptr);
    while (avcodec_receive_frame(dc.vctx, frm) >= 0) handle_video_frame(frm);
  }
  if (want_audio && dc.actx) {
    avcodec_send_packet(dc.actx, nullptr);
    while (avcodec_receive_frame(dc.actx, frm) >= 0) handle_audio_frame(frm);
  }
  if (swr) {  // drain resampler
    int max_out = swr_get_out_samples(swr, 0);
    if (max_out > 0) {
      size_t off = audio.size();
      audio.resize(off + max_out);
      uint8_t *outp = (uint8_t *)(audio.data() + off);
      int got = swr_convert(swr, &outp, max_out, nullptr, 0);
      audio.resize(off + std::max(got, 0));
    }
  }

  // ---- fps resampling: pick nearest decoded frame per output tick ----
  int64_t n_out_frames = (int64_t)frame_pts.size();
  double out_fps = native_fps;
  std::vector<int64_t> pick;
  if (want_video && target_fps > 0 && !frame_pts.empty()) {
    out_fps = target_fps;
    double t0 = frame_pts.front();
    double t_end = std::min(end_sec, frame_pts.back() + 1.0 / native_fps);
    int64_t n_ticks =
        (int64_t)std::llround((t_end - t0) * target_fps);
    n_ticks = std::max<int64_t>(n_ticks, 1);
    size_t j = 0;
    for (int64_t i = 0; i < n_ticks; i++) {
      double t = t0 + i / target_fps;
      while (j + 1 < frame_pts.size() &&
             std::abs(frame_pts[j + 1] - t) <= std::abs(frame_pts[j] - t))
        j++;
      pick.push_back((int64_t)j);
    }
    n_out_frames = (int64_t)pick.size();
  }

  const size_t fbytes = (size_t)dst_w * dst_h * 3;
  if (want_video) {
    out->frames = (uint8_t *)malloc(std::max<size_t>(n_out_frames * fbytes, 1));
    if (!pick.empty()) {
      for (int64_t i = 0; i < n_out_frames; i++)
        std::memcpy(out->frames + (size_t)i * fbytes,
                    frames.data() + (size_t)pick[i] * fbytes, fbytes);
    } else {
      std::memcpy(out->frames, frames.data(), frames.size());
    }
    out->n_frames = n_out_frames;
    out->width = dst_w;
    out->height = dst_h;
    out->fps = out_fps;
    out->first_video_pts = first_vpts < 0 ? 0 : first_vpts;
  }
  if (want_audio) {
    // trim audio to [start, end]
    int64_t lo = 0, hi = (int64_t)audio.size();
    // audio decode began at the seek keyframe; pts tracking per-sample is
    // approximate — trim from the front so audio aligns with start_sec
    // relative to the first *decoded* audio sample
    out->audio = (float *)malloc(std::max<size_t>((hi - lo) * 4, 4));
    std::memcpy(out->audio, audio.data() + lo, (hi - lo) * 4);
    out->n_samples = hi - lo;
    out->sample_rate = out_sr;
  }

  av_frame_free(&frm);
  av_frame_free(&rgb);
  av_packet_free(&pkt);
  if (sws) sws_freeContext(sws);
  if (swr) swr_free(&swr);
  return VM_OK;
}

void vm_free_decoded(VmDecoded *d) {
  if (d->frames) free(d->frames);
  if (d->audio) free(d->audio);
  d->frames = nullptr;
  d->audio = nullptr;
}

// --------------------------------------------------------------------- //
// mux RGB frames + f32 mono audio into mp4 (h264 crf + aac) — the
// reference's write_video contract (utils/utils.py:52-136,
// reencode_videos.py:19-26).
int vm_write_video(const char *path, const uint8_t *frames, int64_t n_frames,
                   int w, int h, double fps, int crf, const float *audio,
                   int64_t n_samples, int sample_rate) {
  AVFormatContext *fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) return fail(VM_ERR_OPEN, "cannot allocate output context");

  // ---- video stream (libx264, yuv420p) ----
  const AVCodec *vcodec = avcodec_find_encoder_by_name("libx264");
  if (!vcodec) vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!vcodec) return fail(VM_ERR_ENCODE, "no video encoder");
  AVStream *vs = avformat_new_stream(fmt, nullptr);
  AVCodecContext *vc = avcodec_alloc_context3(vcodec);
  vc->width = w;
  vc->height = h;
  vc->pix_fmt = AV_PIX_FMT_YUV420P;
  vc->time_base = av_d2q(1.0 / fps, 100000);
  vc->framerate = av_d2q(fps, 100000);
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    vc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  char crf_str[16];
  snprintf(crf_str, sizeof crf_str, "%d", crf);
  av_opt_set(vc->priv_data, "crf", crf_str, 0);
  av_opt_set(vc->priv_data, "preset", "fast", 0);
  if (avcodec_open2(vc, vcodec, nullptr) < 0)
    return fail(VM_ERR_ENCODE, "cannot open video encoder");
  avcodec_parameters_from_context(vs->codecpar, vc);
  vs->time_base = vc->time_base;

  // ---- audio stream (aac) ----
  AVCodecContext *ac = nullptr;
  AVStream *as = nullptr;
  SwrContext *aswr = nullptr;
  if (audio && n_samples > 0) {
    const AVCodec *acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!acodec) return fail(VM_ERR_ENCODE, "no aac encoder");
    as = avformat_new_stream(fmt, nullptr);
    ac = avcodec_alloc_context3(acodec);
    ac->sample_rate = sample_rate;
    av_channel_layout_default(&ac->ch_layout, 1);
    ac->sample_fmt = AV_SAMPLE_FMT_FLTP;
    ac->bit_rate = 128000;
    ac->time_base = {1, sample_rate};
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      ac->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(ac, acodec, nullptr) < 0)
      return fail(VM_ERR_ENCODE, "cannot open aac encoder");
    avcodec_parameters_from_context(as->codecpar, ac);
    as->time_base = ac->time_base;
  }

  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
      return fail(VM_ERR_OPEN, std::string("cannot open for write: ") + path);
  if (avformat_write_header(fmt, nullptr) < 0)
    return fail(VM_ERR_ENCODE, "cannot write header");

  AVPacket *pkt = av_packet_alloc();
  auto mux = [&](AVCodecContext *cc, AVStream *st) {
    while (avcodec_receive_packet(cc, pkt) >= 0) {
      av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  // encode video
  SwsContext *sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVFrame *yuv = av_frame_alloc();
  yuv->format = AV_PIX_FMT_YUV420P;
  yuv->width = w;
  yuv->height = h;
  av_frame_get_buffer(yuv, 32);
  for (int64_t i = 0; i < n_frames; i++) {
    const uint8_t *src[1] = {frames + (size_t)i * w * h * 3};
    int stride[1] = {w * 3};
    av_frame_make_writable(yuv);
    sws_scale(sws, src, stride, 0, h, yuv->data, yuv->linesize);
    yuv->pts = i;
    avcodec_send_frame(vc, yuv);
    mux(vc, vs);
  }
  avcodec_send_frame(vc, nullptr);
  mux(vc, vs);

  // encode audio in frame_size chunks (fltp mono)
  if (ac) {
    int fs = ac->frame_size > 0 ? ac->frame_size : 1024;
    AVFrame *af = av_frame_alloc();
    af->format = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_default(&af->ch_layout, 1);
    af->sample_rate = sample_rate;
    af->nb_samples = fs;
    av_frame_get_buffer(af, 0);
    int64_t pos = 0, pts = 0;
    while (pos < n_samples) {
      int count = (int)std::min<int64_t>(fs, n_samples - pos);
      av_frame_make_writable(af);
      std::memcpy(af->data[0], audio + pos, count * 4);
      if (count < fs)
        std::memset(af->data[0] + count * 4, 0, (fs - count) * 4);
      af->nb_samples = fs;
      af->pts = pts;
      avcodec_send_frame(ac, af);
      mux(ac, as);
      pos += count;
      pts += fs;
    }
    avcodec_send_frame(ac, nullptr);
    mux(ac, as);
    av_frame_free(&af);
  }

  av_write_trailer(fmt);
  av_packet_free(&pkt);
  av_frame_free(&yuv);
  sws_freeContext(sws);
  avcodec_free_context(&vc);
  if (ac) avcodec_free_context(&ac);
  if (aswr) swr_free(&aswr);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return VM_OK;
}

}  // extern "C"
