// Audio codec shim over libavcodec (C API for ctypes).
//
// Replaces the reference's faad2 wrapper (src/dab/audio/aac_audio_decoder.cpp)
// and mpg123 wrapper (src/dab/audio/mp2_audio_decoder.cpp) with the system
// libavcodec: HE-AAC (DAB+) decode is initialised from the hand-built MPEG-4
// AudioSpecificConfig (960-sample transform + SBR extension); MP2 (classic
// DAB) decode feeds raw frames. Output is interleaved int16 PCM.
//
// NOTE: ffmpeg's native AAC decoder historically rejects the 960-sample
// transform used by DAB+; dec_open reports failure cleanly in that case and
// callers fall back to bitstream export (same information the reference's
// scraper stores).

#include <cstdint>
#include <cstring>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
}

struct Decoder {
    const AVCodec* codec = nullptr;
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
};

extern "C" {

// codec_kind: 0 = AAC (extradata = AudioSpecificConfig), 1 = MP2
void* dec_open(int codec_kind, const uint8_t* extradata, int extradata_len) {
    const AVCodecID id = codec_kind == 0 ? AV_CODEC_ID_AAC : AV_CODEC_ID_MP2;
    const AVCodec* codec = avcodec_find_decoder(id);
    if (!codec) return nullptr;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    if (!ctx) return nullptr;
    if (extradata && extradata_len > 0) {
        ctx->extradata = static_cast<uint8_t*>(
            av_mallocz(size_t(extradata_len) + AV_INPUT_BUFFER_PADDING_SIZE));
        std::memcpy(ctx->extradata, extradata, size_t(extradata_len));
        ctx->extradata_size = extradata_len;
    }
    ctx->request_sample_fmt = AV_SAMPLE_FMT_S16;
    if (avcodec_open2(ctx, codec, nullptr) < 0) {
        avcodec_free_context(&ctx);
        return nullptr;
    }
    auto* d = new Decoder();
    d->codec = codec;
    d->ctx = ctx;
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    return d;
}

void dec_close(void* h) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return;
    av_frame_free(&d->frame);
    av_packet_free(&d->pkt);
    avcodec_free_context(&d->ctx);
    delete d;
}

// Decode one frame/access unit. Returns number of int16 samples written to
// pcm_out (interleaved), 0 if no output yet, negative on error.
// On success, *sample_rate and *channels describe the output.
int64_t dec_decode(void* h, const uint8_t* data, int32_t nb_bytes,
                   int16_t* pcm_out, int64_t pcm_capacity,
                   int32_t* sample_rate, int32_t* channels) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return -1;
    if (av_new_packet(d->pkt, nb_bytes) < 0) return -2;
    std::memcpy(d->pkt->data, data, size_t(nb_bytes));
    int ret = avcodec_send_packet(d->ctx, d->pkt);
    av_packet_unref(d->pkt);
    if (ret < 0) return -3;

    int64_t total = 0;
    while (true) {
        ret = avcodec_receive_frame(d->ctx, d->frame);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
        if (ret < 0) return -4;
        const int ch = d->ctx->ch_layout.nb_channels;
        const int ns = d->frame->nb_samples;
        *sample_rate = d->ctx->sample_rate;
        *channels = ch;
        if (total + int64_t(ns) * ch > pcm_capacity) {
            av_frame_unref(d->frame);
            return -5;
        }
        const AVSampleFormat fmt = AVSampleFormat(d->frame->format);
        if (fmt == AV_SAMPLE_FMT_S16) {
            std::memcpy(pcm_out + total, d->frame->data[0],
                        size_t(ns) * size_t(ch) * 2);
        } else if (fmt == AV_SAMPLE_FMT_S16P) {
            for (int s = 0; s < ns; s++)
                for (int c = 0; c < ch; c++)
                    pcm_out[total + int64_t(s) * ch + c] =
                        reinterpret_cast<int16_t*>(d->frame->data[c])[s];
        } else if (fmt == AV_SAMPLE_FMT_FLTP) {
            for (int s = 0; s < ns; s++)
                for (int c = 0; c < ch; c++) {
                    float v = reinterpret_cast<float*>(d->frame->data[c])[s];
                    v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
                    pcm_out[total + int64_t(s) * ch + c] =
                        int16_t(v * 32767.0f);
                }
        } else if (fmt == AV_SAMPLE_FMT_FLT) {
            const float* p = reinterpret_cast<float*>(d->frame->data[0]);
            for (int64_t s = 0; s < int64_t(ns) * ch; s++) {
                float v = p[s];
                v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
                pcm_out[total + s] = int16_t(v * 32767.0f);
            }
        } else {
            av_frame_unref(d->frame);
            return -6;
        }
        total += int64_t(ns) * ch;
        av_frame_unref(d->frame);
    }
    return total;
}

// Float-output variant (no int16 round-trip): used for the AAC-LC core that
// feeds the SBR stage, where int16 quantization noise would otherwise be
// amplified by envelope normalization in spectrally-empty source bands.
// Output is at int16 scale (+-32768) to keep one convention downstream.
int64_t dec_decode_f32(void* h, const uint8_t* data, int32_t nb_bytes,
                       float* pcm_out, int64_t pcm_capacity,
                       int32_t* sample_rate, int32_t* channels) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return -1;
    if (av_new_packet(d->pkt, nb_bytes) < 0) return -2;
    std::memcpy(d->pkt->data, data, size_t(nb_bytes));
    int ret = avcodec_send_packet(d->ctx, d->pkt);
    av_packet_unref(d->pkt);
    if (ret < 0) return -3;
    int64_t total = 0;
    while (true) {
        ret = avcodec_receive_frame(d->ctx, d->frame);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
        if (ret < 0) return -4;
        const int ch = d->ctx->ch_layout.nb_channels;
        const int ns = d->frame->nb_samples;
        *sample_rate = d->ctx->sample_rate;
        *channels = ch;
        if (total + int64_t(ns) * ch > pcm_capacity) {
            av_frame_unref(d->frame);
            return -5;
        }
        const AVSampleFormat fmt = AVSampleFormat(d->frame->format);
        if (fmt == AV_SAMPLE_FMT_FLTP) {
            for (int s = 0; s < ns; s++)
                for (int c = 0; c < ch; c++)
                    pcm_out[total + int64_t(s) * ch + c] =
                        reinterpret_cast<float*>(d->frame->data[c])[s]
                        * 32768.0f;
        } else if (fmt == AV_SAMPLE_FMT_FLT) {
            const float* p = reinterpret_cast<float*>(d->frame->data[0]);
            for (int64_t s = 0; s < int64_t(ns) * ch; s++)
                pcm_out[total + s] = p[s] * 32768.0f;
        } else if (fmt == AV_SAMPLE_FMT_S16) {
            const int16_t* p = reinterpret_cast<int16_t*>(d->frame->data[0]);
            for (int64_t s = 0; s < int64_t(ns) * ch; s++)
                pcm_out[total + s] = float(p[s]);
        } else if (fmt == AV_SAMPLE_FMT_S16P) {
            for (int s = 0; s < ns; s++)
                for (int c = 0; c < ch; c++)
                    pcm_out[total + int64_t(s) * ch + c] = float(
                        reinterpret_cast<int16_t*>(d->frame->data[c])[s]);
        } else {
            av_frame_unref(d->frame);
            return -6;
        }
        total += int64_t(ns) * ch;
        av_frame_unref(d->frame);
    }
    return total;
}

// ---- encoders (test fixtures + transmitter payloads) ----------------------
//
// The reference's closed-loop tests rely on simulate_transmitter filling
// frames with random bytes; here real encoded audio (AAC raw AUs / MP2
// frames) feeds the transmitter so the decode chain is exercised end-to-end
// down to PCM. AAC encodes at 1024 (ffmpeg encoder limitation) — used as a
// bitstream-walker oracle; MP2 frames are DAB-legal as-is.

struct Encoder {
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int64_t next_pts = 0;
};

// codec_kind: 0 = AAC (raw AUs + ASC extradata), 1 = MP2
void* enc_open(int codec_kind, int sample_rate, int channels, int bit_rate) {
    const AVCodecID id = codec_kind == 0 ? AV_CODEC_ID_AAC : AV_CODEC_ID_MP2;
    const AVCodec* codec = avcodec_find_encoder(id);
    if (!codec) return nullptr;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    if (!ctx) return nullptr;
    ctx->sample_rate = sample_rate;
    av_channel_layout_default(&ctx->ch_layout, channels);
    ctx->bit_rate = bit_rate;
    ctx->sample_fmt = codec_kind == 0 ? AV_SAMPLE_FMT_FLTP : AV_SAMPLE_FMT_S16;
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;  // raw AUs; ASC in extradata
    if (avcodec_open2(ctx, codec, nullptr) < 0) {
        avcodec_free_context(&ctx);
        return nullptr;
    }
    auto* e = new Encoder();
    e->ctx = ctx;
    e->pkt = av_packet_alloc();
    e->frame = av_frame_alloc();
    return e;
}

void enc_close(void* h) {
    auto* e = static_cast<Encoder*>(h);
    if (!e) return;
    av_frame_free(&e->frame);
    av_packet_free(&e->pkt);
    avcodec_free_context(&e->ctx);
    delete e;
}

int32_t enc_frame_size(void* h) {
    return static_cast<Encoder*>(h)->ctx->frame_size;
}

int32_t enc_extradata(void* h, uint8_t* out, int32_t cap) {
    auto* e = static_cast<Encoder*>(h);
    if (e->ctx->extradata_size > cap) return -1;
    std::memcpy(out, e->ctx->extradata, size_t(e->ctx->extradata_size));
    return e->ctx->extradata_size;
}

// Feed nb_samples (per channel, interleaved int16; must equal frame_size, or
// 0 to flush) and drain any ready packets. Packet boundaries are recorded in
// sizes_out (one entry per packet); returns the number of packets, with the
// concatenated bytes in out. Negative on error.
int32_t enc_encode(void* h, const int16_t* pcm, int32_t nb_samples,
                   uint8_t* out, int64_t out_capacity,
                   int32_t* sizes_out, int32_t sizes_capacity) {
    auto* e = static_cast<Encoder*>(h);
    if (!e) return -1;
    int ret;
    if (nb_samples > 0) {
        const int ch = e->ctx->ch_layout.nb_channels;
        e->frame->nb_samples = nb_samples;
        e->frame->format = e->ctx->sample_fmt;
        av_channel_layout_copy(&e->frame->ch_layout, &e->ctx->ch_layout);
        if (av_frame_get_buffer(e->frame, 0) < 0) return -2;
        if (e->ctx->sample_fmt == AV_SAMPLE_FMT_FLTP) {
            for (int c = 0; c < ch; c++) {
                float* dst = reinterpret_cast<float*>(e->frame->data[c]);
                for (int s = 0; s < nb_samples; s++)
                    dst[s] = float(pcm[int64_t(s) * ch + c]) / 32768.0f;
            }
        } else {
            std::memcpy(e->frame->data[0], pcm,
                        size_t(nb_samples) * size_t(ch) * 2);
        }
        e->frame->pts = e->next_pts;
        e->next_pts += nb_samples;
        ret = avcodec_send_frame(e->ctx, e->frame);
        av_frame_unref(e->frame);
    } else {
        ret = avcodec_send_frame(e->ctx, nullptr);  // flush
    }
    if (ret < 0 && ret != AVERROR_EOF) return -3;

    int32_t n_pkts = 0;
    int64_t total = 0;
    while (true) {
        ret = avcodec_receive_packet(e->ctx, e->pkt);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
        if (ret < 0) return -4;
        if (n_pkts >= sizes_capacity
            || total + e->pkt->size > out_capacity) {
            av_packet_unref(e->pkt);
            return -5;
        }
        std::memcpy(out + total, e->pkt->data, size_t(e->pkt->size));
        sizes_out[n_pkts++] = e->pkt->size;
        total += e->pkt->size;
        av_packet_unref(e->pkt);
    }
    return n_pkts;
}

}  // extern "C"
