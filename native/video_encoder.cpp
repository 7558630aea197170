// Native video encoder: BGR24 frames -> libx264 (or any libavcodec
// encoder) -> MP4, with frame-threaded encoding.
//
// Why this exists: (1) the image's OpenCV bundles an ffmpeg WITHOUT any
// h264 encoder, so the repo could never produce the codec real VODs use —
// benchmarks and fixtures were mpeg4-only; the SYSTEM libavcodec this
// file links does have libx264.  (2) the GT (manuscript) path is
// encode-bound: cv2's mp4v writer costs ~15 ms per 2080x1120 frame on
// one thread (reference writes annotated output with cv2.VideoWriter
// mp4v — reference: annotator.py:72); libx264 veryfast with
// frame-threading moves most of that work off the caller's thread.
//
// Build: g++ -O3 -shared -fPIC video_encoder.cpp -lavformat -lavcodec
//        -lavutil -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstring>

namespace {

struct Encoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVStream* stream = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  SwsContext* sws = nullptr;
  int w = 0, h = 0;
  int64_t next_pts = 0;
  bool header_written = false;
};

int flush_packets(Encoder* e) {
  for (;;) {
    int ret = avcodec_receive_packet(e->codec, e->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
    if (ret < 0) return ret;
    av_packet_rescale_ts(e->pkt, e->codec->time_base, e->stream->time_base);
    e->pkt->stream_index = e->stream->index;
    ret = av_interleaved_write_frame(e->fmt, e->pkt);
    if (ret < 0) return ret;
  }
}

}  // namespace

extern "C" {

// codec_name: "libx264", "mpeg4", ... ; preset/crf apply to x264 only
// (pass crf<0 for defaults).  threads=0 lets the encoder pick.
void* ve_open(const char* path, int w, int h, double fps,
              const char* codec_name, const char* preset, int crf,
              int threads) {
  av_log_set_level(AV_LOG_ERROR);  // x264 info banners otherwise spam stderr
  Encoder* e = new Encoder();
  e->w = w;
  e->h = h;
  const AVCodec* enc = avcodec_find_encoder_by_name(codec_name);
  if (!enc) { delete e; return nullptr; }
  if (avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path) < 0)
    goto fail;
  e->stream = avformat_new_stream(e->fmt, nullptr);
  if (!e->stream) goto fail;
  e->codec = avcodec_alloc_context3(enc);
  if (!e->codec) goto fail;
  e->codec->width = w;
  e->codec->height = h;
  e->codec->time_base = av_d2q(1.0 / fps, 120000);
  e->codec->framerate = av_d2q(fps, 120000);
  e->codec->pix_fmt = AV_PIX_FMT_YUV420P;
  e->codec->thread_count = threads;
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->codec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (preset && *preset)
    av_opt_set(e->codec->priv_data, "preset", preset, 0);
  if (crf >= 0) {
    if (av_opt_set_int(e->codec->priv_data, "crf", crf, 0) < 0) {
      // Codecs without a crf option (mpeg4/mp4v — the reference's own
      // output codec, reference: annotator.py:72): interpret the value
      // as a constant quantizer instead (1 = best, 31 = worst), so the
      // one quality knob works across codecs.
      int q = crf < 1 ? 1 : (crf > 31 ? 31 : crf);
      e->codec->flags |= AV_CODEC_FLAG_QSCALE;
      e->codec->global_quality = FF_QP2LAMBDA * q;
    }
  }
  if (avcodec_open2(e->codec, enc, nullptr) < 0) goto fail;
  if (avcodec_parameters_from_context(e->stream->codecpar, e->codec) < 0)
    goto fail;
  e->stream->time_base = e->codec->time_base;
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE) < 0) goto fail;
  }
  if (avformat_write_header(e->fmt, nullptr) < 0) goto fail;
  e->header_written = true;
  e->frame = av_frame_alloc();
  e->pkt = av_packet_alloc();
  if (!e->frame || !e->pkt) goto fail;
  e->frame->format = AV_PIX_FMT_YUV420P;
  e->frame->width = w;
  e->frame->height = h;
  if (av_frame_get_buffer(e->frame, 0) < 0) goto fail;
  return e;
fail:
  if (e->codec) avcodec_free_context(&e->codec);
  if (e->fmt) {
    if (e->fmt->pb) avio_closep(&e->fmt->pb);
    avformat_free_context(e->fmt);
  }
  if (e->frame) av_frame_free(&e->frame);
  if (e->pkt) av_packet_free(&e->pkt);
  delete e;
  return nullptr;
}

// data: packed uint8 frame in the given input format.
// fmt: 0 = BGR24 ([h,w,3]), 1 = RGBA ([h,w,4]).  RGBA input lets the
// renderer hand over its canvas without a host-side cvtColor pass — the
// single sws_scale does color conversion + 420 subsampling either way.
int ve_write_fmt(void* h_, const unsigned char* data, int fmt) {
  Encoder* e = (Encoder*)h_;
  if (av_frame_make_writable(e->frame) < 0) return -1;
  AVPixelFormat in_fmt = fmt == 1 ? AV_PIX_FMT_RGBA : AV_PIX_FMT_BGR24;
  int bpp = fmt == 1 ? 4 : 3;
  e->sws = sws_getCachedContext(e->sws, e->w, e->h, in_fmt, e->w,
                                e->h, AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                nullptr, nullptr, nullptr);
  if (!e->sws) return -2;
  const uint8_t* src[4] = {data, nullptr, nullptr, nullptr};
  int src_stride[4] = {e->w * bpp, 0, 0, 0};
  sws_scale(e->sws, src, src_stride, 0, e->h, e->frame->data,
            e->frame->linesize);
  e->frame->pts = e->next_pts++;
  if (e->codec->flags & AV_CODEC_FLAG_QSCALE)
    e->frame->quality = e->codec->global_quality;
  int ret = avcodec_send_frame(e->codec, e->frame);
  if (ret < 0) return ret;
  return flush_packets(e);
}

// bgr: [h, w, 3] uint8.  Returns 0 on success.
int ve_write(void* h_, const unsigned char* bgr) {
  return ve_write_fmt(h_, bgr, 0);
}

int ve_close(void* h_) {
  Encoder* e = (Encoder*)h_;
  if (!e) return 0;
  int ret = 0;
  if (e->codec && e->header_written) {
    avcodec_send_frame(e->codec, nullptr);  // drain
    ret = flush_packets(e);
    av_write_trailer(e->fmt);
  }
  if (e->sws) sws_freeContext(e->sws);
  if (e->frame) av_frame_free(&e->frame);
  if (e->pkt) av_packet_free(&e->pkt);
  if (e->codec) avcodec_free_context(&e->codec);
  if (e->fmt) {
    if (e->fmt->pb) avio_closep(&e->fmt->pb);
    avformat_free_context(e->fmt);
  }
  delete e;
  return ret;
}

}  // extern "C"
