// Native VOD decoder: demux + decode + per-fighter crop extraction in one
// pass, without ever converting the full frame to BGR.
//
// Why this exists: the AI-path hot loop needs two ~300px crops per frame,
// resampled to the model's 128px input.  OpenCV's VideoCapture.read()
// converts the ENTIRE decoded frame YUV->BGR (at 1080p that conversion
// costs as much as the decode itself), then Python slices crops out of it.
// Here the decoder hands us YUV planes and we sws_scale ONLY the two crop
// regions straight to letterboxed BGR output tiles — the full-frame
// conversion disappears from the budget.  (Replaces the decode half of the
// reference's per-frame cv2 loop, reference: manuscript.py:154,
// ai_runner.py:404-422.)
//
// Bonus lever: `lowres` fractional decode.  Codecs that support it (mpeg4
// does; h264 does not) decode at 1/2^lowres resolution for ~4x/16x less
// IDCT work.  Crops are resampled to 128px regardless, so reduced-resolution
// decode does not change the model input distribution materially; label
// agreement is validated by tests.
//
// Crop geometry matches YoloCrop.square_crop semantics (reference:
// fighter.py:323-381): center/half computed with int() truncation in
// FULL-RESOLUTION pixel coordinates, square side = 2*(half+padding),
// out-of-frame area letterboxed black, INTER_AREA-style resampling
// (SWS_AREA) to the output size.
//
// Build: g++ -O3 -shared -fPIC video_decoder.cpp -lavformat -lavcodec
//        -lavutil -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstring>
#include <cstdint>
#include <cmath>
#include <algorithm>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  const AVStream* stream = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  SwsContext* sws = nullptr;   // direct path, cached via sws_getCachedContext
  SwsContext* sws_cvt = nullptr;  // odd-origin stage 1: region YUV->BGR 1:1
  SwsContext* sws_box = nullptr;  // odd-origin stage 2: BGR rect -> dst
  uint8_t* scratch = nullptr;     // stage-1 BGR region buffer
  size_t scratch_cap = 0;
  int stream_index = -1;
  int lowres = 0;
  int max_lowres = 0;  // codec capability (0 for h264, 3 for mpeg4)
  int fast = 0;
  // Full-resolution (container) dims; crop geometry is computed in these
  // coordinates so lowres decode yields the same boxes.
  int full_w = 0, full_h = 0;
  double fps = 0.0;
  int64_t nb_frames = 0;
  int64_t next_index = 0;   // index of the next frame decode will return
  bool pending = false;     // d->frame already holds frame `next_index`
  bool draining = false;
  // Stride-skip mode (vd_set_stride_skip): while decoding a chunk whose
  // caller only extracts every `skip_stride`-th frame, packets whose
  // display index falls on a non-extracted slot are sent with
  // skip_frame=AVDISCARD_NONREF — the codec drops the picture IF AND ONLY
  // IF nothing references it, so extracted frames decode bit-identically
  // while non-referenced in-between frames (x264's non-ref B's) skip
  // their reconstruction cost entirely.
  bool stride_skip = false;  // feature toggle (vd_set_stride_skip)
  int skip_stride = 1;       // active stride during a decode call
  int64_t skip_lo = 0, skip_hi = 0;  // active chunk [start, start+n)
};

int64_t pts_to_index(const Decoder* d, int64_t pts) {
  if (pts == AV_NOPTS_VALUE) return d->next_index;
  double t = pts * av_q2d(d->stream->time_base);
  return (int64_t)llround(t * d->fps);
}

// Pull the next decoded frame into d->frame.  Returns 1 on frame, 0 on EOF,
// <0 on error.
int next_frame(Decoder* d) {
  for (;;) {
    int ret = avcodec_receive_frame(d->codec, d->frame);
    if (ret == 0) return 1;
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return ret;
    if (d->draining) return 0;
    // Feed more packets.
    for (;;) {
      ret = av_read_frame(d->fmt, d->pkt);
      if (ret == AVERROR_EOF) {
        avcodec_send_packet(d->codec, nullptr);
        d->draining = true;
        break;
      }
      if (ret < 0) return ret;
      if (d->pkt->stream_index == d->stream_index) {
        if (d->skip_stride > 1) {
          // Per-packet skip decision: a packet's pts is its picture's
          // display time, so the non-extracted test is exact even with
          // B-frame reordering.  Outside the active chunk (lookahead into
          // the next chunk, whose grid we don't know yet) and on the
          // stream's final frame (EOF accounting must stay exact) the
          // codec decodes normally.
          AVDiscard sk = AVDISCARD_DEFAULT;
          if (d->pkt->pts != AV_NOPTS_VALUE) {
            int64_t idx = pts_to_index(d, d->pkt->pts);
            bool in_chunk = idx >= d->skip_lo && idx < d->skip_hi;
            bool extracted =
                in_chunk && ((idx - d->skip_lo) % d->skip_stride) == 0;
            bool last = d->nb_frames > 0 && idx >= d->nb_frames - 1;
            if (in_chunk && !extracted && !last) sk = AVDISCARD_NONREF;
          }
          d->codec->skip_frame = sk;
        }
        ret = avcodec_send_packet(d->codec, d->pkt);
        av_packet_unref(d->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(d->pkt);
    }
  }
}

}  // namespace

extern "C" {

// fast != 0 trades bit-exactness for decode speed on codecs with an
// in-loop deblocking filter (h264 most notably — which has no fractional
// lowres, so this is its only reduced-cost decode mode): skips the loop
// filter and enables the codec's non-spec-compliant speedups.  The model
// consumes 128px-resampled crops, so the pixel deltas are sub-visible
// there; label agreement vs the exact path is validated by tests.
// fast == 2 means "auto": apply the fast flags only when the stream's
// codec actually has an in-loop deblocking filter (h264/hevc/vp8/vp9/av1)
// — on mpeg4 and friends the flags are at best no-ops and FLAG2_FAST can
// change decoder behavior for no speedup, so auto leaves them exact.
static bool codec_has_inloop_deblock(AVCodecID id) {
  switch (id) {
    case AV_CODEC_ID_H264:
    case AV_CODEC_ID_HEVC:
    case AV_CODEC_ID_VP8:
    case AV_CODEC_ID_VP9:
    case AV_CODEC_ID_AV1:
      return true;
    default:
      return false;
  }
}

void* vd_open_ex(const char* path, int lowres, int fast) {
  Decoder* d = new Decoder();
  d->fast = fast;
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) goto fail;
  {
    const AVCodec* dec = nullptr;
    d->stream_index =
        av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (d->stream_index < 0 || !dec) goto fail;
    d->stream = d->fmt->streams[d->stream_index];
    d->codec = avcodec_alloc_context3(dec);
    if (!d->codec) goto fail;
    if (avcodec_parameters_to_context(d->codec, d->stream->codecpar) < 0)
      goto fail;
    d->full_w = d->codec->width;
    d->full_h = d->codec->height;
    d->codec->thread_count = 1;  // caller parallelizes across segments
    // Fractional decode where the codec supports it (mpeg4: max_lowres 3).
    d->max_lowres = (int)dec->max_lowres;
    d->lowres = std::min(lowres, (int)dec->max_lowres);
    if (d->lowres > 0) d->codec->lowres = d->lowres;
    if (d->fast == 2)  // auto: fast only where an in-loop deblock exists
      d->fast = codec_has_inloop_deblock(dec->id) ? 1 : 0;
    if (d->fast) {
      d->codec->skip_loop_filter = AVDISCARD_ALL;
      d->codec->flags2 |= AV_CODEC_FLAG2_FAST;
    }
    if (avcodec_open2(d->codec, dec, nullptr) < 0) goto fail;
    AVRational fr = d->stream->avg_frame_rate;
    if (fr.num <= 0 || fr.den <= 0) fr = d->stream->r_frame_rate;
    // num==0 with den!=0 happens in real containers; a 0.0 fps would make
    // vd_seek divide by it and pts_to_index collapse every frame to 0.
    d->fps = (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 60.0;
    d->nb_frames = d->stream->nb_frames;
    if (d->nb_frames <= 0 && d->stream->duration > 0)
      d->nb_frames = (int64_t)llround(
          d->stream->duration * av_q2d(d->stream->time_base) * d->fps);
    d->frame = av_frame_alloc();
    d->pkt = av_packet_alloc();
    if (!d->frame || !d->pkt) goto fail;
  }
  return d;
fail:
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  delete d;
  return nullptr;
}

void* vd_open(const char* path, int lowres) {
  return vd_open_ex(path, lowres, 0);
}

int vd_full_width(void* h) { return ((Decoder*)h)->full_w; }
int vd_full_height(void* h) { return ((Decoder*)h)->full_h; }
int vd_lowres(void* h) { return ((Decoder*)h)->lowres; }
// Codec lowres capability: the clamp auto-lowres must respect.  Lets a
// lowres=0 probe open answer "could this stream decode fractionally?"
// without a second, lowres=3 open (whose handle would then be useless
// for the common full-res run — see native_decoder.probe/acquire).
int vd_max_lowres(void* h) { return ((Decoder*)h)->max_lowres; }
// Effective fast mode after "auto" (2) resolution: 1 if the fast flags
// were applied to this stream's codec, else 0.
int vd_fast(void* h) { return ((Decoder*)h)->fast; }
double vd_fps(void* h) { return ((Decoder*)h)->fps; }
long vd_num_frames(void* h) { return (long)((Decoder*)h)->nb_frames; }

// Seek so the next decoded frame is `index` (decode-forward from the
// nearest earlier keyframe).  Returns 0 on success.
int vd_seek(void* h, long index) {
  Decoder* d = (Decoder*)h;
  d->skip_stride = 1;  // stale chunk windows must not drop preroll refs
  if (index == d->next_index) return d->pending ? 1 : 0;
  double t = index / d->fps;
  int64_t ts = (int64_t)(t / av_q2d(d->stream->time_base));
  if (av_seek_frame(d->fmt, d->stream_index, ts, AVSEEK_FLAG_BACKWARD) < 0)
    return -1;
  avcodec_flush_buffers(d->codec);
  d->draining = false;
  d->pending = false;
  // Decode forward until the frame before `index` is consumed.
  for (;;) {
    int ret = next_frame(d);
    if (ret <= 0) return ret < 0 ? ret : -2;  // EOF before target
    int64_t idx = pts_to_index(d, d->frame->best_effort_timestamp);
    if (idx >= index) {
      // d->frame currently HOLDS frame `idx`; mark it pending so the next
      // decode call uses it.  We emulate by remembering we already have it:
      d->next_index = idx;
      return 1;  // frame already decoded and waiting in d->frame
    }
    d->next_index = idx + 1;
  }
}

// Decode frames [start, start+n) and write K letterboxed crops per
// extracted frame into `out`.  boxes: [n, K, 4] float32 normalized
// (cx, cy, w, h).  Frames where (i % stride) != 0 are decoded but not
// extracted.  Returns the number of frames decoded, or <0 on error.
//
// fmt 0: BGR24, out layout [n, K, out_size, out_size, 3] (caller-zeroed).
// fmt 1: planar YUV420P, out layout [n, K, out_size*out_size*3/2] packed
//        Y then U then V — HALF the bytes of BGR for the host->device
//        link; the device converts to RGB (BT.601 limited range, matching
//        what swscale would do on the host).  out_size must be even.
// dense != 0 packs extracted frames' crops contiguously: frame i (i %
// stride == 0) writes to output slot i/stride, so `out` is
// [ceil(n/stride), K, ...] and the caller ships it to the device without
// a host-side strided gather.  dense == 0 keeps the sparse layout
// ([n, K, ...], non-extracted slots untouched).
static long vd_decode_crops_impl(void* h, long start, long n,
                                 const float* boxes, int K, int pad,
                                 int out_size, int stride, int fmt, int dense,
                                 unsigned char* out) {
  Decoder* d = (Decoder*)h;
  if (stride < 1) stride = 1;
  if (fmt == 1 && (out_size & 1)) return -10;
  bool have_frame = d->pending && start == d->next_index;
  d->pending = false;
  if (start != d->next_index) {
    int s = vd_seek(h, start);
    if (s < 0) return s;
    have_frame = (s == 1);
  }
  // Arm stride-skip for this chunk (after any seek: preroll must decode
  // normally).  skip_frame is restored before returning so external
  // callers of vd_seek/next_frame see default decoding.
  if (d->stride_skip && stride > 1 && K > 0) {
    d->skip_stride = stride;
    d->skip_lo = start;
    d->skip_hi = start + n;
  } else {
    d->skip_stride = 1;
  }
  const size_t crop_bytes = fmt == 1
                                ? (size_t)out_size * out_size * 3 / 2
                                : (size_t)out_size * out_size * 3;
  const size_t y_bytes = (size_t)out_size * out_size;
  const size_t c_bytes = y_bytes / 4;
  long decoded = 0;
  for (long i = 0; i < n; ++i) {
    if (!have_frame) {
      int ret = next_frame(d);
      if (ret < 0) {
        d->skip_stride = 1;
        d->codec->skip_frame = AVDISCARD_DEFAULT;
        return ret;
      }
      if (ret == 0) break;  // EOF
    }
    have_frame = false;
    int64_t idx = pts_to_index(d, d->frame->best_effort_timestamp);
    // Align the output slot to the frame's pts-derived index so boxes[i]
    // always describes the frame written to slot i, even on streams whose
    // pts skip or repeat (seek overshoot, dropped frames, duplicate pts).
    if (idx < start + i) {  // stale/duplicate frame: drop, refetch this slot
      av_frame_unref(d->frame);
      --i;
      continue;
    }
    if (idx >= start + n) {  // stream jumped past the chunk: remaining
      d->next_index = idx;   // slots stay black; frame waits for next call
      d->pending = true;
      // In stride-skip mode a missing chunk tail is usually our own
      // policy-dropped non-extracted frames; count those slots so the
      // caller's [:decoded] view keeps the chunk's full label grid
      // (mid-chunk policy gaps are already counted by the idx-jump
      // above).  Only valid when the chunk's last EXTRACTED slot really
      // decoded — a tail that also swallows an extracted frame is stream
      // loss (truncated file, pts gap), and claiming it would hand the
      // caller never-decoded black crops as if they were real frames.
      if (d->skip_stride > 1 && stride > 0) {
        long last_ex = ((n - 1) / stride) * stride;
        if (decoded > last_ex) decoded = n;
      }
      break;
    }
    if (idx > start + i) i = idx - start;  // skipped slots stay black
    d->next_index = idx + 1;
    decoded = i + 1;  // high-water slot count: caller's [:decoded] view
                      // covers every slot this call wrote
    if (K == 0 || (i % stride) != 0) {
      av_frame_unref(d->frame);
      continue;
    }
    const long slot = dense ? i / stride : i;
    const AVFrame* f = d->frame;
    const int dec_w = f->width, dec_h = f->height;
    // Full-res -> decoded-res scale (1 unless lowres).
    const double sx = (double)dec_w / d->full_w;
    const double sy = (double)dec_h / d->full_h;
    if (fmt == 1) {
      // Prefill processed frames' crop blocks with YUV black (Y=16,
      // U=V=128 in limited range == BGR 0,0,0) so letterbox/skip areas
      // match the BGR path's black.
      for (int k = 0; k < K; ++k) {
        unsigned char* blk = out + ((size_t)slot * K + k) * crop_bytes;
        memset(blk, 16, y_bytes);
        memset(blk + y_bytes, 128, 2 * c_bytes);
      }
    }
    for (int k = 0; k < K; ++k) {
      const float* b = boxes + ((size_t)i * K + k) * 4;
      // YoloCrop.square_crop int-truncation geometry in full-res coords
      // (reference: fighter.py:323-344).
      const int cxp = (int)(b[0] * d->full_w);
      const int cyp = (int)(b[1] * d->full_h);
      const int bw = (int)(b[2] * d->full_w);
      const int bh = (int)(b[3] * d->full_h);
      const int half = std::max(bw, bh) / 2;
      const int side = 2 * (half + pad);
      if (side <= 0) continue;
      const int x0 = cxp - half - pad, y0 = cyp - half - pad;
      // Visible part of the square in full-res coords.
      const int vx0 = std::max(0, x0), vy0 = std::max(0, y0);
      const int vx1 = std::min(d->full_w, x0 + side);
      const int vy1 = std::min(d->full_h, y0 + side);
      if (vx1 <= vx0 || vy1 <= vy0) continue;
      // Map to decoded coords.  Planar chroma pointers can only address
      // even luma columns/rows, so odd-origin rects go through a two-stage
      // path below (an even-aligned superset is converted to packed BGR
      // 1:1, which any pixel offset can address); aligning the origin down
      // instead would shift the whole crop by a pixel — at far-zoom sprite
      // sizes that measurably flips labels vs the cv2 baseline.
      const int sx0e = (int)(vx0 * sx);
      const int sy0e = (int)(vy0 * sy);
      const int ox = sx0e & 1, oy = sy0e & 1;
      int sx0 = sx0e & ~1;
      int sy0 = sy0e & ~1;
      int sw = std::min(dec_w - sx0e, (int)lrint((vx1 - vx0) * sx));
      int sh = std::min(dec_h - sy0e, (int)lrint((vy1 - vy0) * sy));
      if (sw < 2 || sh < 2) continue;
      // Destination sub-rectangle of the letterboxed out_size tile,
      // proportional to the visible part of the square.
      int dx0 = (int)lrint((double)(vx0 - x0) * out_size / side);
      int dy0 = (int)lrint((double)(vy0 - y0) * out_size / side);
      int dw = (int)lrint((double)(vx1 - vx0) * out_size / side);
      int dh = (int)lrint((double)(vy1 - vy0) * out_size / side);
      if (fmt == 1) {
        // 4:2:0 destination: offsets and extents chroma-aligned (costs at
        // most 1px of letterbox placement on out-of-frame crops).
        dx0 &= ~1;
        dy0 &= ~1;
        dw &= ~1;
        dh &= ~1;
      }
      dw = std::min(dw, out_size - dx0);
      dh = std::min(dh, out_size - dy0);
      if (dw < (fmt == 1 ? 2 : 1) || dh < (fmt == 1 ? 2 : 1)) continue;
      const AVPixelFormat dst_fmt =
          fmt == 1 ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_BGR24;
      unsigned char* crop = out + ((size_t)slot * K + k) * crop_bytes;
      const int cs = out_size / 2;
      uint8_t* dst[4] = {nullptr, nullptr, nullptr, nullptr};
      int dst_stride[4] = {0, 0, 0, 0};
      if (fmt == 1) {
        dst[0] = crop + (size_t)dy0 * out_size + dx0;
        dst[1] = crop + y_bytes + (size_t)(dy0 / 2) * cs + dx0 / 2;
        dst[2] = crop + y_bytes + c_bytes + (size_t)(dy0 / 2) * cs + dx0 / 2;
        dst_stride[0] = out_size;
        dst_stride[1] = dst_stride[2] = cs;
      } else {
        dst[0] = crop + (size_t)dy0 * out_size * 3 + (size_t)dx0 * 3;
        dst_stride[0] = out_size * 3;
      }
      const AVPixFmtDescriptor* desc =
          av_pix_fmt_desc_get((AVPixelFormat)f->format);
      const uint8_t* src[4] = {nullptr, nullptr, nullptr, nullptr};
      for (int p = 0; p < 4 && f->data[p]; ++p) {
        const int hshift = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
        const int vshift = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
        src[p] = f->data[p] + (size_t)(sy0 >> vshift) * f->linesize[p] +
                 ((sx0 >> hshift) * (desc->comp[p].step));
      }
      if (ox || oy) {
        // Two-stage odd-origin path.  Stage 1: even-aligned superset
        // region -> packed BGR at 1:1 (identity scale; chroma upsampling
        // matches the full-frame conversion for aligned regions, verified
        // bit-exact vs the cv2 baseline).  Stage 2: the EXACT rect —
        // packed BGR addresses any pixel — scaled to the destination.
        int ew = std::min(dec_w - sx0, (sw + ox + 15) & ~15);
        int eh = std::min(dec_h - sy0, (sh + oy + 1) & ~1);
        if (ew < sw + ox) sw = ew - ox;
        if (eh < sh + oy) sh = eh - oy;
        if (sw < 2 || sh < 2) continue;
        const int sstride = (ew * 3 + 63) & ~63;
        const size_t need = (size_t)sstride * eh;
        if (need > d->scratch_cap) {
          av_free(d->scratch);
          d->scratch = (uint8_t*)av_malloc(need);
          d->scratch_cap = d->scratch ? need : 0;
        }
        if (!d->scratch) continue;
        d->sws_cvt = sws_getCachedContext(
            d->sws_cvt, ew, eh, (AVPixelFormat)f->format, ew, eh,
            AV_PIX_FMT_BGR24, SWS_POINT, nullptr, nullptr, nullptr);
        if (!d->sws_cvt) continue;
        uint8_t* cvt_dst[4] = {d->scratch, nullptr, nullptr, nullptr};
        int cvt_stride[4] = {sstride, 0, 0, 0};
        sws_scale(d->sws_cvt, src, f->linesize, 0, eh, cvt_dst, cvt_stride);
        d->sws_box = sws_getCachedContext(
            d->sws_box, sw, sh, AV_PIX_FMT_BGR24, dw, dh, dst_fmt,
            SWS_AREA, nullptr, nullptr, nullptr);
        if (!d->sws_box) continue;
        const uint8_t* bsrc[4] = {
            d->scratch + (size_t)oy * sstride + (size_t)ox * 3, nullptr,
            nullptr, nullptr};
        int bstride[4] = {sstride, 0, 0, 0};
        sws_scale(d->sws_box, bsrc, bstride, 0, sh, dst, dst_stride);
      } else {
        d->sws = sws_getCachedContext(
            d->sws, sw, sh, (AVPixelFormat)f->format, dw, dh, dst_fmt,
            SWS_AREA, nullptr, nullptr, nullptr);
        if (!d->sws) continue;
        sws_scale(d->sws, src, f->linesize, 0, sh, dst, dst_stride);
      }
    }
    av_frame_unref(d->frame);
  }
  d->skip_stride = 1;
  d->codec->skip_frame = AVDISCARD_DEFAULT;
  return decoded;
}

long vd_decode_crops_fmt(void* h, long start, long n, const float* boxes,
                         int K, int pad, int out_size, int stride, int fmt,
                         unsigned char* out) {
  return vd_decode_crops_impl(h, start, n, boxes, K, pad, out_size, stride,
                              fmt, 0, out);
}

long vd_decode_crops_dense(void* h, long start, long n, const float* boxes,
                           int K, int pad, int out_size, int stride, int fmt,
                           unsigned char* out) {
  return vd_decode_crops_impl(h, start, n, boxes, K, pad, out_size, stride,
                              fmt, 1, out);
}

long vd_decode_crops(void* h, long start, long n, const float* boxes, int K,
                     int pad, int out_size, int stride, unsigned char* out) {
  return vd_decode_crops_impl(h, start, n, boxes, K, pad, out_size, stride, 0,
                              0, out);
}

// Enable/disable stride-skip (see Decoder::stride_skip).  Off by default;
// callers that decode with stride > 1 and never read the in-between
// frames can turn it on for free h264/hevc decode savings (non-ref
// pictures on non-extracted slots skip reconstruction; extracted frames
// are bit-identical because only unreferenced pictures are ever dropped).
void vd_set_stride_skip(void* h, int enable) {
  ((Decoder*)h)->stride_skip = enable != 0;
}

void vd_close(void* h) {
  Decoder* d = (Decoder*)h;
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->sws_cvt) sws_freeContext(d->sws_cvt);
  if (d->sws_box) sws_freeContext(d->sws_box);
  av_free(d->scratch);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // extern "C"
