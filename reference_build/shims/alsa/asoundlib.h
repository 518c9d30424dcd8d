/* ALSA header shim — monitor.c only installs an error-message silencer
 * (snd_lib_error_set_handler, monitor.c:350).  Inline no-op; no ALSA
 * library needed.
 */
#ifndef ALSA_SHIM_H
#define ALSA_SHIM_H 1

typedef void (*snd_lib_error_handler_t)(const char *file, int line,
                                        const char *function, int err,
                                        const char *fmt, ...);
static inline int snd_lib_error_set_handler(snd_lib_error_handler_t handler) {
  (void)handler;
  return 0;
}
#endif
