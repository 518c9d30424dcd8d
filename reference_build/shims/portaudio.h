/* Minimal portaudio header shim — the stock `monitor` is built for its
 * HEADLESS pipe mode only (`monitor -q --pipe fifo`, monitor.c:357-361),
 * where no Pa_* call ever runs except Pa_GetStreamTime(NULL) inside
 * qlen() (monitor-data.c:931); the stub returns 0.0 so
 * qlen == wptr - rptr exactly (Last_callback_time stays 0 on the pipe
 * path).  Declarations match the public portaudio v19 API names the
 * monitor sources reference; implementations are no-op stubs in
 * portaudio_stub.c.  Original code — no portaudio source was consulted
 * beyond the API surface monitor.c uses.
 */
#ifndef PORTAUDIO_SHIM_H
#define PORTAUDIO_SHIM_H 1

#ifdef __cplusplus
extern "C" {
#endif

typedef int PaError;
typedef int PaDeviceIndex;
typedef double PaTime;
typedef void PaStream;
typedef unsigned long PaSampleFormat;
typedef unsigned long PaStreamFlags;
typedef unsigned long PaStreamCallbackFlags;

#define paNoError 0
#define paNoDevice ((PaDeviceIndex)-1)
#define paFloat32 ((PaSampleFormat)0x00000001)
#define paInt16 ((PaSampleFormat)0x00000008)
#define paNoFlag ((PaStreamFlags)0)
#define paClipOff ((PaStreamFlags)0x00000001)
#define paContinue 0
#define paComplete 1
#define paAbort 2
#define paOutputUnderflow ((PaStreamCallbackFlags)0x00000004)

typedef struct PaStreamCallbackTimeInfo {
  PaTime inputBufferAdcTime;
  PaTime currentTime;
  PaTime outputBufferDacTime;
} PaStreamCallbackTimeInfo;

typedef struct PaDeviceInfo {
  int structVersion;
  const char *name;
  int hostApi;
  int maxInputChannels;
  int maxOutputChannels;
  PaTime defaultLowInputLatency;
  PaTime defaultLowOutputLatency;
  PaTime defaultHighInputLatency;
  PaTime defaultHighOutputLatency;
  double defaultSampleRate;
} PaDeviceInfo;

typedef struct PaStreamParameters {
  PaDeviceIndex device;
  int channelCount;
  PaSampleFormat sampleFormat;
  PaTime suggestedLatency;
  void *hostApiSpecificStreamInfo;
} PaStreamParameters;

typedef int PaStreamCallback(const void *input, void *output,
                             unsigned long frameCount,
                             const PaStreamCallbackTimeInfo *timeInfo,
                             PaStreamCallbackFlags statusFlags,
                             void *userData);

PaError Pa_Initialize(void);
PaError Pa_Terminate(void);
const char *Pa_GetErrorText(PaError errorCode);
PaDeviceIndex Pa_GetDeviceCount(void);
PaDeviceIndex Pa_GetDefaultOutputDevice(void);
const PaDeviceInfo *Pa_GetDeviceInfo(PaDeviceIndex device);
PaError Pa_OpenStream(PaStream **stream,
                      const PaStreamParameters *inputParameters,
                      const PaStreamParameters *outputParameters,
                      double sampleRate, unsigned long framesPerBuffer,
                      PaStreamFlags streamFlags,
                      PaStreamCallback *streamCallback, void *userData);
PaError Pa_CloseStream(PaStream *stream);
PaError Pa_StartStream(PaStream *stream);
PaError Pa_StopStream(PaStream *stream);
PaError Pa_AbortStream(PaStream *stream);
PaError Pa_IsStreamActive(PaStream *stream);
PaError Pa_IsStreamStopped(PaStream *stream);
PaTime Pa_GetStreamTime(PaStream *stream);

#ifdef __cplusplus
}
#endif
#endif
