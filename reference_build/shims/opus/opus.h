/* Minimal libopus header shim — declarations only, matching the public
 * Opus ABI (request codes and the varargs encoder_ctl convention), so
 * ka9q-radio's audio.c links against the system libopus.so.0 in an image
 * without libopus-dev.  Covers only the encoder surface audio.c touches.
 */
#ifndef OPUS_SHIM_H
#define OPUS_SHIM_H 1

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int32_t opus_int32;
typedef int16_t opus_int16;
typedef uint32_t opus_uint32;
typedef struct OpusEncoder OpusEncoder;
typedef struct OpusDecoder OpusDecoder;

#define OPUS_OK 0
#define OPUS_BAD_ARG (-1)
#define OPUS_BUFFER_TOO_SMALL (-2)
#define OPUS_INTERNAL_ERROR (-3)
#define OPUS_INVALID_PACKET (-4)
#define OPUS_UNIMPLEMENTED (-5)
#define OPUS_INVALID_STATE (-6)
#define OPUS_ALLOC_FAIL (-7)
#define OPUS_AUTO (-1000)
#define OPUS_BITRATE_MAX (-1)

#define OPUS_APPLICATION_VOIP 2048
#define OPUS_APPLICATION_AUDIO 2049
#define OPUS_APPLICATION_RESTRICTED_LOWDELAY 2051

#define OPUS_SIGNAL_VOICE 3001
#define OPUS_SIGNAL_MUSIC 3002

#define OPUS_BANDWIDTH_NARROWBAND 1101
#define OPUS_BANDWIDTH_MEDIUMBAND 1102
#define OPUS_BANDWIDTH_WIDEBAND 1103
#define OPUS_BANDWIDTH_SUPERWIDEBAND 1104
#define OPUS_BANDWIDTH_FULLBAND 1105

/* ctl request codes (public ABI values) + vararg-style helper macros */
#define OPUS_SET_APPLICATION(x) 4000, (opus_int32)(x)
#define OPUS_GET_APPLICATION(x) 4001, (opus_int32 *)(x)
#define OPUS_SET_BITRATE(x) 4002, (opus_int32)(x)
#define OPUS_GET_BITRATE(x) 4003, (opus_int32 *)(x)
#define OPUS_SET_MAX_BANDWIDTH(x) 4004, (opus_int32)(x)
#define OPUS_GET_MAX_BANDWIDTH(x) 4005, (opus_int32 *)(x)
#define OPUS_SET_VBR(x) 4006, (opus_int32)(x)
#define OPUS_GET_VBR(x) 4007, (opus_int32 *)(x)
#define OPUS_SET_BANDWIDTH(x) 4008, (opus_int32)(x)
#define OPUS_GET_BANDWIDTH(x) 4009, (opus_int32 *)(x)
#define OPUS_SET_COMPLEXITY(x) 4010, (opus_int32)(x)
#define OPUS_SET_INBAND_FEC(x) 4012, (opus_int32)(x)
#define OPUS_SET_PACKET_LOSS_PERC(x) 4014, (opus_int32)(x)
#define OPUS_SET_DTX(x) 4016, (opus_int32)(x)
#define OPUS_GET_DTX(x) 4017, (opus_int32 *)(x)
#define OPUS_SET_VBR_CONSTRAINT(x) 4020, (opus_int32)(x)
#define OPUS_SET_SIGNAL(x) 4024, (opus_int32)(x)
#define OPUS_GET_SIGNAL(x) 4025, (opus_int32 *)(x)
#define OPUS_GET_LOOKAHEAD(x) 4027, (opus_int32 *)(x)
#define OPUS_RESET_STATE 4028
#define OPUS_GET_SAMPLE_RATE(x) 4029, (opus_int32 *)(x)
#define OPUS_SET_LSB_DEPTH(x) 4036, (opus_int32)(x)

OpusEncoder *opus_encoder_create(opus_int32 fs, int channels, int application, int *error);
void opus_encoder_destroy(OpusEncoder *st);
int opus_encoder_ctl(OpusEncoder *st, int request, ...);
opus_int32 opus_encode_float(OpusEncoder *st, const float *pcm, int frame_size,
                             unsigned char *data, opus_int32 max_data_bytes);
/* decoder surface (monitor's playback path — an implicit declaration here
 * would truncate the returned pointer to int and SEGV) */
OpusDecoder *opus_decoder_create(opus_int32 fs, int channels, int *error);
void opus_decoder_destroy(OpusDecoder *st);
int opus_decoder_ctl(OpusDecoder *st, int request, ...);
int opus_decode_float(OpusDecoder *st, const unsigned char *data, opus_int32 len,
                      float *pcm, int frame_size, int decode_fec);
int opus_decode(OpusDecoder *st, const unsigned char *data, opus_int32 len,
                opus_int16 *pcm, int frame_size, int decode_fec);
void opus_pcm_soft_clip(float *pcm, int frame_size, int channels, float *softclip_mem);
const char *opus_strerror(int error);
const char *opus_get_version_string(void);

/* packet inspection helpers (pcmrecord uses them on received payloads) */
int opus_packet_get_nb_frames(const unsigned char packet[], opus_int32 len);
int opus_packet_get_nb_samples(const unsigned char packet[], opus_int32 len,
                               opus_int32 fs);
int opus_packet_get_samples_per_frame(const unsigned char *data, opus_int32 fs);
int opus_packet_get_bandwidth(const unsigned char *data);
int opus_packet_get_nb_channels(const unsigned char *data);

#ifdef __cplusplus
}
#endif
#endif
