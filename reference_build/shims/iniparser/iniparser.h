/* Minimal iniparser API shim — the surface ka9q-radio's config.c/radio.c
 * use.  Semantics follow the real library: keys stored lowercase as
 * "section:key", getboolean accepts y/n/t/f/0/1, sections enumerate in
 * file order.  Build-only aid for golden-parity capture; not the real
 * library.
 */
#ifndef INIPARSER_SHIM_H
#define INIPARSER_SHIM_H 1

#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct _dictionary_ {
  int n;        /* number of entries */
  int size;     /* allocated slots */
  char **key;   /* "section" (val NULL) or "section:key" */
  char **val;
} dictionary;

dictionary *iniparser_load(const char *ininame);
void iniparser_freedict(dictionary *d);

const char *iniparser_getstring(const dictionary *d, const char *key, const char *def);
int iniparser_getint(const dictionary *d, const char *key, int notfound);
double iniparser_getdouble(const dictionary *d, const char *key, double notfound);
int iniparser_getboolean(const dictionary *d, const char *key, int notfound);

int iniparser_getnsec(const dictionary *d);
const char *iniparser_getsecname(const dictionary *d, int n);
int iniparser_getsecnkeys(const dictionary *d, const char *s);
const char **iniparser_getseckeys(const dictionary *d, const char *s, const char **keys);

#ifdef __cplusplus
}
#endif
#endif
