/* Fast WAV decode/encode for the sddm_tpu data pipeline.
 *
 * Native-path equivalent of the reference's torchaudio.load/save (the only
 * native IO surface the reference leans on — SURVEY.md §2 native-code
 * statement).  Exposed via ctypes; all entry points are GIL-free C so the
 * Python thread-pool loader decodes in true parallel.
 *
 * Supports RIFF/WAVE with PCM 16/24/32-bit and IEEE float32, mono or
 * multi-channel (planar float32 output, channel-major like torchaudio).
 *
 * Build: cc -O2 -shared -fPIC wavio.c -o libwavio.so
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define WAV_OK 0
#define WAV_ERR_OPEN -1
#define WAV_ERR_FORMAT -2
#define WAV_ERR_UNSUPPORTED -3
#define WAV_ERR_RANGE -4
#define WAV_ERR_IO -5

typedef struct {
    uint16_t audio_format; /* 1 = PCM, 3 = IEEE float */
    uint16_t channels;
    uint32_t sample_rate;
    uint16_t bits_per_sample;
    long data_offset; /* byte offset of sample data */
    long data_bytes;  /* length of the data chunk */
} wav_header;

static int read_header(FILE *f, wav_header *h) {
    uint8_t riff[12];
    if (fread(riff, 1, 12, f) != 12) return WAV_ERR_FORMAT;
    if (memcmp(riff, "RIFF", 4) != 0 || memcmp(riff + 8, "WAVE", 4) != 0)
        return WAV_ERR_FORMAT;

    int have_fmt = 0;
    for (;;) {
        uint8_t hdr[8];
        if (fread(hdr, 1, 8, f) != 8) return WAV_ERR_FORMAT;
        uint32_t size = (uint32_t)hdr[4] | ((uint32_t)hdr[5] << 8) |
                        ((uint32_t)hdr[6] << 16) | ((uint32_t)hdr[7] << 24);
        if (memcmp(hdr, "fmt ", 4) == 0) {
            uint8_t fmt[16];
            if (size < 16 || fread(fmt, 1, 16, f) != 16) return WAV_ERR_FORMAT;
            h->audio_format = (uint16_t)(fmt[0] | (fmt[1] << 8));
            h->channels = (uint16_t)(fmt[2] | (fmt[3] << 8));
            h->sample_rate = (uint32_t)fmt[4] | ((uint32_t)fmt[5] << 8) |
                             ((uint32_t)fmt[6] << 16) | ((uint32_t)fmt[7] << 24);
            h->bits_per_sample = (uint16_t)(fmt[14] | (fmt[15] << 8));
            if (size > 16 && fseek(f, (long)size - 16, SEEK_CUR) != 0)
                return WAV_ERR_FORMAT;
            have_fmt = 1;
        } else if (memcmp(hdr, "data", 4) == 0) {
            if (!have_fmt) return WAV_ERR_FORMAT;
            h->data_offset = ftell(f);
            h->data_bytes = (long)size;
            return WAV_OK;
        } else {
            /* skip unknown chunk (word-aligned) */
            long skip = (long)size + (size & 1);
            if (fseek(f, skip, SEEK_CUR) != 0) return WAV_ERR_FORMAT;
        }
    }
}

/* Number of frames (samples per channel); fills sr and channels. */
long wav_info(const char *path, int *sample_rate, int *channels) {
    FILE *f = fopen(path, "rb");
    if (!f) return WAV_ERR_OPEN;
    wav_header h;
    int rc = read_header(f, &h);
    fclose(f);
    if (rc != WAV_OK) return rc;
    int bytes = h.bits_per_sample / 8;
    if (bytes == 0 || h.channels == 0) return WAV_ERR_FORMAT;
    *sample_rate = (int)h.sample_rate;
    *channels = (int)h.channels;
    return h.data_bytes / (bytes * h.channels);
}

static void convert(const uint8_t *raw, float *out, long frames, int channels,
                    int bits, int is_float) {
    long i;
    int c;
    if (is_float && bits == 32) {
        const float *src = (const float *)raw;
        for (i = 0; i < frames; i++)
            for (c = 0; c < channels; c++)
                out[(long)c * frames + i] = src[i * channels + c];
    } else if (bits == 16) {
        const int16_t *src = (const int16_t *)raw;
        const float scale = 1.0f / 32768.0f;
        for (i = 0; i < frames; i++)
            for (c = 0; c < channels; c++)
                out[(long)c * frames + i] = (float)src[i * channels + c] * scale;
    } else if (bits == 24) {
        const float scale = 1.0f / 8388608.0f;
        for (i = 0; i < frames; i++)
            for (c = 0; c < channels; c++) {
                const uint8_t *p = raw + 3 * (i * channels + c);
                int32_t v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                                      ((uint32_t)p[2] << 16));
                if (v & 0x800000) v |= ~0xFFFFFF; /* sign extend */
                out[(long)c * frames + i] = (float)v * scale;
            }
    } else { /* bits == 32 PCM */
        const int32_t *src = (const int32_t *)raw;
        const float scale = 1.0f / 2147483648.0f;
        for (i = 0; i < frames; i++)
            for (c = 0; c < channels; c++)
                out[(long)c * frames + i] = (float)src[i * channels + c] * scale;
    }
}

/* Decode frames [start, start+length) into planar float32 out[channels][length].
 * Returns frames written or a negative error. */
long wav_read_crop_f32(const char *path, long start, long length, float *out,
                       int *sample_rate, int *channels) {
    FILE *f = fopen(path, "rb");
    if (!f) return WAV_ERR_OPEN;
    wav_header h;
    int rc = read_header(f, &h);
    if (rc != WAV_OK) { fclose(f); return rc; }

    int bits = h.bits_per_sample;
    int is_float = h.audio_format == 3;
    if (!(bits == 16 || bits == 24 || bits == 32) ||
        (h.audio_format != 1 && h.audio_format != 3)) {
        fclose(f);
        return WAV_ERR_UNSUPPORTED;
    }
    int frame_bytes = (bits / 8) * h.channels;
    long total = h.data_bytes / frame_bytes;
    if (start < 0) start = 0;
    if (start > total) { fclose(f); return WAV_ERR_RANGE; }
    if (length < 0 || start + length > total) length = total - start;

    if (fseek(f, h.data_offset + start * frame_bytes, SEEK_SET) != 0) {
        fclose(f);
        return WAV_ERR_IO;
    }
    uint8_t *raw = (uint8_t *)malloc((size_t)length * frame_bytes);
    if (!raw) { fclose(f); return WAV_ERR_IO; }
    long got = (long)fread(raw, frame_bytes, (size_t)length, f);
    fclose(f);
    convert(raw, out, got, h.channels, bits, is_float);
    free(raw);
    *sample_rate = (int)h.sample_rate;
    *channels = (int)h.channels;
    return got;
}

/* Full decode convenience wrapper. */
long wav_read_f32(const char *path, float *out, int *sample_rate,
                  int *channels) {
    return wav_read_crop_f32(path, 0, -1, out, sample_rate, channels);
}

/* Write planar float32 [channels][frames] as PCM16. */
int wav_write_pcm16(const char *path, const float *data, long frames,
                    int channels, int sample_rate) {
    FILE *f = fopen(path, "wb");
    if (!f) return WAV_ERR_OPEN;
    long data_bytes = frames * channels * 2;
    uint32_t riff_size = (uint32_t)(36 + data_bytes);
    uint8_t hdr[44];
    memcpy(hdr, "RIFF", 4);
    memcpy(hdr + 4, &riff_size, 4);
    memcpy(hdr + 8, "WAVEfmt ", 8);
    uint32_t fmt_size = 16;
    memcpy(hdr + 16, &fmt_size, 4);
    uint16_t fmt = 1, ch = (uint16_t)channels, bits = 16;
    uint32_t sr = (uint32_t)sample_rate;
    uint32_t byte_rate = sr * ch * 2;
    uint16_t block_align = ch * 2;
    memcpy(hdr + 20, &fmt, 2);
    memcpy(hdr + 22, &ch, 2);
    memcpy(hdr + 24, &sr, 4);
    memcpy(hdr + 28, &byte_rate, 4);
    memcpy(hdr + 32, &block_align, 2);
    memcpy(hdr + 34, &bits, 2);
    memcpy(hdr + 36, "data", 4);
    uint32_t db = (uint32_t)data_bytes;
    memcpy(hdr + 40, &db, 4);
    if (fwrite(hdr, 1, 44, f) != 44) { fclose(f); return WAV_ERR_IO; }

    int16_t *buf = (int16_t *)malloc((size_t)frames * channels * 2);
    if (!buf) { fclose(f); return WAV_ERR_IO; }
    long i;
    int c;
    for (i = 0; i < frames; i++)
        for (c = 0; c < channels; c++) {
            float v = data[(long)c * frames + i];
            if (v > 1.0f) v = 1.0f;
            if (v < -1.0f) v = -1.0f;
            buf[i * channels + c] = (int16_t)(v * 32767.0f);
        }
    size_t wrote = fwrite(buf, 2, (size_t)frames * channels, f);
    free(buf);
    fclose(f);
    return wrote == (size_t)(frames * channels) ? WAV_OK : WAV_ERR_IO;
}
