/* No-op portaudio implementation for the headless (-q --pipe) monitor
 * build.  None of these run on the pipe path except Pa_GetStreamTime
 * (monitor-data.c:931 qlen), which must return 0.0 — see portaudio.h.
 */
#include "portaudio.h"
#include <stddef.h>

PaError Pa_Initialize(void) { return paNoError; }
PaError Pa_Terminate(void) { return paNoError; }
const char *Pa_GetErrorText(PaError e) { (void)e; return "portaudio stub"; }
PaDeviceIndex Pa_GetDeviceCount(void) { return 0; }
PaDeviceIndex Pa_GetDefaultOutputDevice(void) { return paNoDevice; }
const PaDeviceInfo *Pa_GetDeviceInfo(PaDeviceIndex d) { (void)d; return NULL; }
PaError Pa_OpenStream(PaStream **stream, const PaStreamParameters *in,
                      const PaStreamParameters *out, double rate,
                      unsigned long frames, PaStreamFlags flags,
                      PaStreamCallback *cb, void *user) {
  (void)in; (void)out; (void)rate; (void)frames; (void)flags; (void)cb; (void)user;
  if (stream) *stream = NULL;
  return -1;
}
PaError Pa_CloseStream(PaStream *s) { (void)s; return paNoError; }
PaError Pa_StartStream(PaStream *s) { (void)s; return -1; }
PaError Pa_StopStream(PaStream *s) { (void)s; return paNoError; }
PaError Pa_AbortStream(PaStream *s) { (void)s; return paNoError; }
PaError Pa_IsStreamActive(PaStream *s) { (void)s; return 0; }
PaError Pa_IsStreamStopped(PaStream *s) { (void)s; return 1; }
PaTime Pa_GetStreamTime(PaStream *s) { (void)s; return 0.0; }
