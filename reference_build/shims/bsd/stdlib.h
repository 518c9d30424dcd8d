/* libbsd stdlib.h shim: arc4random family (links libbsd.so.0). */
#ifndef BSD_STDLIB_SHIM_H
#define BSD_STDLIB_SHIM_H 1

#include <stdlib.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

uint32_t arc4random(void);
void arc4random_buf(void *buf, size_t nbytes);
uint32_t arc4random_uniform(uint32_t upper_bound);

#ifdef __cplusplus
}
#endif
#endif
