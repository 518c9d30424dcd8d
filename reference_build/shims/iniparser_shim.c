/* Implementation of the iniparser shim (see iniparser/iniparser.h). */
#include "iniparser/iniparser.h"

#include <ctype.h>
#include <stdlib.h>
#include <string.h>

static char *xstrdup(const char *s) { return strdup(s ? s : ""); }

static void lowercase(char *s) {
  for (; *s; s++)
    *s = (char)tolower((unsigned char)*s);
}

static char *trim(char *s) {
  while (isspace((unsigned char)*s))
    s++;
  char *e = s + strlen(s);
  while (e > s && isspace((unsigned char)e[-1]))
    *--e = 0;
  return s;
}

static void dict_add(dictionary *d, const char *key, const char *val) {
  if (d->n == d->size) {
    d->size = d->size ? 2 * d->size : 64;
    d->key = realloc(d->key, d->size * sizeof(char *));
    d->val = realloc(d->val, d->size * sizeof(char *));
  }
  d->key[d->n] = xstrdup(key);
  d->val[d->n] = val ? xstrdup(val) : NULL;
  d->n++;
}

dictionary *iniparser_load(const char *ininame) {
  FILE *fp = fopen(ininame, "r");
  if (!fp)
    return NULL;
  dictionary *d = calloc(1, sizeof *d);
  char line[4096];
  char section[1024] = "";
  while (fgets(line, sizeof line, fp)) {
    char *s = trim(line);
    if (!*s || *s == ';' || *s == '#')
      continue;
    if (*s == '[') {
      char *e = strchr(s, ']');
      if (!e)
        continue;
      *e = 0;
      snprintf(section, sizeof section, "%s", trim(s + 1));
      lowercase(section);
      dict_add(d, section, NULL); /* section marker entry */
      continue;
    }
    char *eq = strchr(s, '=');
    if (!eq || !*section)
      continue;
    *eq = 0;
    char *key = trim(s);
    char *val = trim(eq + 1);
    /* strip trailing comment introduced by whitespace + ; or # */
    for (char *p = val; *p; p++) {
      if ((*p == ';' || *p == '#') && p > val && isspace((unsigned char)p[-1])) {
        *p = 0;
        val = trim(val);
        break;
      }
    }
    /* strip enclosing quotes like the real iniparser */
    size_t vl = strlen(val);
    if (vl >= 2 && val[0] == '"' && val[vl - 1] == '"') {
      val[vl - 1] = 0;
      val++;
    }
    lowercase(key);
    char full[2048];
    snprintf(full, sizeof full, "%s:%s", section, key);
    dict_add(d, full, val);
  }
  fclose(fp);
  return d;
}

void iniparser_freedict(dictionary *d) {
  if (!d)
    return;
  for (int i = 0; i < d->n; i++) {
    free(d->key[i]);
    free(d->val[i]);
  }
  free(d->key);
  free(d->val);
  free(d);
}

const char *iniparser_getstring(const dictionary *d, const char *key, const char *def) {
  if (!d || !key)
    return def;
  char lk[2048];
  snprintf(lk, sizeof lk, "%s", key);
  lowercase(lk);
  for (int i = 0; i < d->n; i++)
    if (d->val[i] && !strcmp(d->key[i], lk))
      return d->val[i];
  return def;
}

int iniparser_getint(const dictionary *d, const char *key, int notfound) {
  const char *v = iniparser_getstring(d, key, NULL);
  return v ? (int)strtol(v, NULL, 0) : notfound;
}

double iniparser_getdouble(const dictionary *d, const char *key, double notfound) {
  const char *v = iniparser_getstring(d, key, NULL);
  return v ? strtod(v, NULL) : notfound;
}

int iniparser_getboolean(const dictionary *d, const char *key, int notfound) {
  const char *v = iniparser_getstring(d, key, NULL);
  if (!v || !*v)
    return notfound;
  switch (tolower((unsigned char)v[0])) {
  case 'y': case 't': case '1': return 1;
  case 'n': case 'f': case '0': return 0;
  default: return notfound;
  }
}

int iniparser_getnsec(const dictionary *d) {
  int n = 0;
  for (int i = 0; d && i < d->n; i++)
    if (d->val[i] == NULL)
      n++;
  return n;
}

const char *iniparser_getsecname(const dictionary *d, int n) {
  int c = 0;
  for (int i = 0; d && i < d->n; i++)
    if (d->val[i] == NULL && c++ == n)
      return d->key[i];
  return NULL;
}

int iniparser_getsecnkeys(const dictionary *d, const char *s) {
  if (!d || !s)
    return 0;
  char pre[1060];
  snprintf(pre, sizeof pre, "%s:", s);
  lowercase(pre);
  int n = 0;
  for (int i = 0; i < d->n; i++)
    if (d->val[i] && !strncmp(d->key[i], pre, strlen(pre)))
      n++;
  return n;
}

const char **iniparser_getseckeys(const dictionary *d, const char *s, const char **keys) {
  if (!d || !s || !keys)
    return NULL;
  char pre[1060];
  snprintf(pre, sizeof pre, "%s:", s);
  lowercase(pre);
  int n = 0;
  for (int i = 0; i < d->n; i++)
    if (d->val[i] && !strncmp(d->key[i], pre, strlen(pre)))
      keys[n++] = d->key[i];
  return keys;
}
