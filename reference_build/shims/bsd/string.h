/* libbsd string.h shim: declare strlcpy/strlcat (glibc 2.36 lacks them)
 * and link against the system libbsd.so.0. */
#ifndef BSD_STRING_SHIM_H
#define BSD_STRING_SHIM_H 1

#include <string.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

size_t strlcpy(char *dst, const char *src, size_t siz);
size_t strlcat(char *dst, const char *src, size_t siz);

#ifdef __cplusplus
}
#endif
#endif
