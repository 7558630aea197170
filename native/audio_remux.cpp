// Native audio remux: mux the original VOD's audio track into a rendered
// (silent) annotated video, stream-copying both — the reference shells out
// to the ffmpeg binary for this (`-c:v copy -map 0:v:0 -map 1:a:0
// -shortest`, reference: manuscript.py:249-279).  This image ships the
// libav* libraries but NOT the ffmpeg binary, so the subprocess seam can
// never succeed here; this file is the in-process equivalent.
//
// Also provides ar_add_tone: encode a sine tone as an AAC track alongside
// a stream-copied video — used by tests to synthesize an audio-bearing
// fixture (nothing else in the image can author one), and by anyone who
// wants a placeholder track.
//
// Build: g++ -O3 -shared -fPIC audio_remux.cpp -lavformat -lavcodec -lavutil

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}

#include <cmath>
#include <cstring>

namespace {

// Pull the next packet of stream `idx` from `fc` into `pkt`.
// Returns 1 on success, 0 on EOF, <0 on error.
int next_packet_of(AVFormatContext* fc, int idx, AVPacket* pkt) {
  for (;;) {
    int ret = av_read_frame(fc, pkt);
    if (ret == AVERROR_EOF) return 0;
    if (ret < 0) return ret;
    if (pkt->stream_index == idx) return 1;
    av_packet_unref(pkt);
  }
}

int copy_stream(AVFormatContext* out, AVStream* in_stream, AVStream** created) {
  AVStream* s = avformat_new_stream(out, nullptr);
  if (!s) return AVERROR(ENOMEM);
  int ret = avcodec_parameters_copy(s->codecpar, in_stream->codecpar);
  if (ret < 0) return ret;
  s->codecpar->codec_tag = 0;
  *created = s;
  return 0;
}

}  // namespace

extern "C" {

// Number of audio streams in the container, or <0 on open failure.
int ar_count_audio(const char* path) {
  AVFormatContext* fc = nullptr;
  if (avformat_open_input(&fc, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fc, nullptr) < 0) {
    avformat_close_input(&fc);
    return -2;
  }
  int n = 0;
  for (unsigned i = 0; i < fc->nb_streams; i++)
    if (fc->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_AUDIO) n++;
  avformat_close_input(&fc);
  return n;
}

// Stream-copy the best video stream of `video_path` and the best audio
// stream of `audio_path` into `out_path`, stopping at the first input to
// end (ffmpeg's -shortest).  Returns 0 on success; -2 when the audio
// source has no audio stream (callers degrade to the silent video); other
// negatives on I/O or container errors.
int ar_remux(const char* video_path, const char* audio_path,
             const char* out_path) {
  AVFormatContext *vin = nullptr, *ain = nullptr, *out = nullptr;
  AVPacket *vpkt = nullptr, *apkt = nullptr;
  int ret = -1;

  do {
    if (avformat_open_input(&vin, video_path, nullptr, nullptr) < 0) break;
    if (avformat_find_stream_info(vin, nullptr) < 0) break;
    if (avformat_open_input(&ain, audio_path, nullptr, nullptr) < 0) break;
    if (avformat_find_stream_info(ain, nullptr) < 0) break;

    int vidx = av_find_best_stream(vin, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    int aidx = av_find_best_stream(ain, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (vidx < 0) break;
    if (aidx < 0) { ret = -2; break; }

    if (avformat_alloc_output_context2(&out, nullptr, nullptr, out_path) < 0 ||
        !out)
      break;
    AVStream *vs = nullptr, *as = nullptr;
    if (copy_stream(out, vin->streams[vidx], &vs) < 0) break;
    if (copy_stream(out, ain->streams[aidx], &as) < 0) break;
    if (!(out->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0)
      break;
    if (avformat_write_header(out, nullptr) < 0) break;

    vpkt = av_packet_alloc();
    apkt = av_packet_alloc();
    if (!vpkt || !apkt) break;

    // Interleave by decode timestamp in seconds; -shortest semantics:
    // the mux stops when EITHER input runs out.
    AVRational vtb = vin->streams[vidx]->time_base;
    AVRational atb = ain->streams[aidx]->time_base;
    int have_v = next_packet_of(vin, vidx, vpkt);
    int have_a = next_packet_of(ain, aidx, apkt);
    // An initial read ERROR (not clean EOF) must fail the remux: falling
    // through with ret=0 would write a packet-less MP4 that the caller
    // then moves over the finished render.
    if (have_v < 0 || have_a < 0) { ret = (have_v < 0 ? have_v : have_a); break; }
    ret = 0;
    while (have_v == 1 && have_a == 1) {
      double vt = (vpkt->dts == AV_NOPTS_VALUE ? 0.0 : vpkt->dts * av_q2d(vtb));
      double at = (apkt->dts == AV_NOPTS_VALUE ? 0.0 : apkt->dts * av_q2d(atb));
      AVPacket* pkt = (vt <= at) ? vpkt : apkt;
      AVStream* src = (vt <= at) ? vin->streams[vidx] : ain->streams[aidx];
      AVStream* dst = (vt <= at) ? vs : as;
      int* have = (vt <= at) ? &have_v : &have_a;
      AVFormatContext* fc = (vt <= at) ? vin : ain;
      int idx = (vt <= at) ? vidx : aidx;

      av_packet_rescale_ts(pkt, src->time_base, dst->time_base);
      pkt->stream_index = dst->index;
      pkt->pos = -1;
      if ((ret = av_interleaved_write_frame(out, pkt)) < 0) break;
      *have = next_packet_of(fc, idx, pkt);
      if (*have < 0) { ret = *have; break; }
    }
    if (ret < 0) break;
    ret = av_write_trailer(out);
  } while (false);

  if (vpkt) av_packet_free(&vpkt);
  if (apkt) av_packet_free(&apkt);
  if (out) {
    if (out->pb && !(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
    avformat_free_context(out);
  }
  if (ain) avformat_close_input(&ain);
  if (vin) avformat_close_input(&vin);
  return ret;
}

// Stream-copy the video of `in_path` into `out_path` and add a mono AAC
// sine-tone track of the same duration.  Test-fixture authoring (no other
// tool in the image can produce an audio-bearing MP4).  Returns 0 on
// success.
int ar_add_tone(const char* in_path, const char* out_path, double freq,
                int sample_rate) {
  AVFormatContext *in = nullptr, *out = nullptr;
  AVCodecContext* ac = nullptr;
  AVFrame* frame = nullptr;
  AVPacket *pkt = nullptr, *apkt = nullptr;
  int ret = -1;

  do {
    if (avformat_open_input(&in, in_path, nullptr, nullptr) < 0) break;
    if (avformat_find_stream_info(in, nullptr) < 0) break;
    int vidx = av_find_best_stream(in, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (vidx < 0) break;
    AVStream* ivs = in->streams[vidx];

    const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!enc) break;
    ac = avcodec_alloc_context3(enc);
    if (!ac) break;
    ac->sample_rate = sample_rate;
    ac->sample_fmt = AV_SAMPLE_FMT_FLTP;
    static const AVChannelLayout kMono = AV_CHANNEL_LAYOUT_MONO;
    av_channel_layout_copy(&ac->ch_layout, &kMono);
    ac->bit_rate = 64000;
    ac->time_base = AVRational{1, sample_rate};

    if (avformat_alloc_output_context2(&out, nullptr, nullptr, out_path) < 0 ||
        !out)
      break;
    if (out->oformat->flags & AVFMT_GLOBALHEADER)
      ac->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(ac, enc, nullptr) < 0) break;

    AVStream* vs = nullptr;
    if (copy_stream(out, ivs, &vs) < 0) break;
    AVStream* as = avformat_new_stream(out, nullptr);
    if (!as) break;
    if (avcodec_parameters_from_context(as->codecpar, ac) < 0) break;
    as->time_base = ac->time_base;

    if (!(out->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0)
      break;
    if (avformat_write_header(out, nullptr) < 0) break;

    pkt = av_packet_alloc();
    apkt = av_packet_alloc();
    if (!pkt || !apkt) break;

    // Pass 1: copy video packets, tracking the end timestamp.
    double video_end = 0.0;
    ret = 0;
    for (;;) {
      int have = next_packet_of(in, vidx, pkt);
      if (have < 0) { ret = have; break; }
      if (have == 0) break;
      int64_t end_ts =
          (pkt->pts == AV_NOPTS_VALUE ? pkt->dts : pkt->pts) +
          (pkt->duration > 0 ? pkt->duration : 0);
      double t = end_ts * av_q2d(ivs->time_base);
      if (t > video_end) video_end = t;
      av_packet_rescale_ts(pkt, ivs->time_base, vs->time_base);
      pkt->stream_index = vs->index;
      pkt->pos = -1;
      if ((ret = av_interleaved_write_frame(out, pkt)) < 0) break;
    }
    if (ret < 0) break;

    // Pass 2: encode the tone up to the video end.  The interleaver
    // buffers the cross-stream reorder; fixture-sized files only.
    int64_t total = (int64_t)(video_end * sample_rate);
    int64_t made = 0;
    frame = av_frame_alloc();
    if (!frame) { ret = AVERROR(ENOMEM); break; }
    frame->format = ac->sample_fmt;
    av_channel_layout_copy(&frame->ch_layout, &ac->ch_layout);
    frame->sample_rate = sample_rate;
    frame->nb_samples = ac->frame_size > 0 ? ac->frame_size : 1024;
    if ((ret = av_frame_get_buffer(frame, 0)) < 0) break;

    bool flushed = false;
    while (!flushed) {
      AVFrame* send = nullptr;
      if (made < total) {
        if ((ret = av_frame_make_writable(frame)) < 0) break;
        int n = frame->nb_samples;
        if (made + n > total) n = (int)(total - made);
        frame->nb_samples = n;
        float* buf = (float*)frame->data[0];
        for (int i = 0; i < n; i++)
          buf[i] = 0.25f * sinf(2.0f * (float)M_PI * (float)freq *
                                (float)(made + i) / (float)sample_rate);
        frame->pts = made;
        made += n;
        send = frame;
      } else {
        flushed = true;  // send the NULL flush frame below
      }
      if ((ret = avcodec_send_frame(ac, send)) < 0) break;
      for (;;) {
        ret = avcodec_receive_packet(ac, apkt);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) { ret = 0; break; }
        if (ret < 0) break;
        av_packet_rescale_ts(apkt, ac->time_base, as->time_base);
        apkt->stream_index = as->index;
        if ((ret = av_interleaved_write_frame(out, apkt)) < 0) break;
      }
      if (ret < 0) break;
    }
    if (ret < 0) break;
    ret = av_write_trailer(out);
  } while (false);

  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (apkt) av_packet_free(&apkt);
  if (ac) avcodec_free_context(&ac);
  if (out) {
    if (out->pb && !(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
    avformat_free_context(out);
  }
  if (in) avformat_close_input(&in);
  return ret;
}

}  // extern "C"
