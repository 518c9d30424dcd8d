/* No-op curses implementation for the headless (-q) stock-monitor build.
 * The display thread is never created in quiet mode (monitor.c:441-444),
 * so these exist only to satisfy the linker.
 */
#include "ncurses.h"
#include <stddef.h>

WINDOW *stdscr = NULL;
WINDOW *curscr = NULL;
int COLS = 80;
int LINES = 24;

WINDOW *initscr(void) { return NULL; }
int endwin(void) { return OK; }
int noecho(void) { return OK; }
int echo(void) { return OK; }
int cbreak(void) { return OK; }
int nocbreak(void) { return OK; }
int raw(void) { return OK; }
int keypad(WINDOW *w, bool b) { (void)w; (void)b; return OK; }
void timeout(int d) { (void)d; }
int nodelay(WINDOW *w, bool b) { (void)w; (void)b; return OK; }
int clearok(WINDOW *w, bool b) { (void)w; (void)b; return OK; }
int curs_set(int v) { (void)v; return OK; }
int getch(void) { return ERR; }
int ungetch(int c) { (void)c; return OK; }
int move(int y, int x) { (void)y; (void)x; return OK; }
int addch(const chtype c) { (void)c; return OK; }
int addstr(const char *s) { (void)s; return OK; }
int addnstr(const char *s, int n) { (void)s; (void)n; return OK; }
int mvaddch(int y, int x, const chtype c) { (void)y; (void)x; (void)c; return OK; }
int mvaddstr(int y, int x, const char *s) { (void)y; (void)x; (void)s; return OK; }
int mvaddnstr(int y, int x, const char *s, int n) { (void)y; (void)x; (void)s; (void)n; return OK; }
int printw(const char *fmt, ...) { (void)fmt; return OK; }
int mvprintw(int y, int x, const char *fmt, ...) { (void)y; (void)x; (void)fmt; return OK; }
int beep(void) { return OK; }
int flash(void) { return OK; }
int erase(void) { return OK; }
int clear(void) { return OK; }
int clrtoeol(void) { return OK; }
int clrtobot(void) { return OK; }
int refresh(void) { return OK; }
int attron(attr_t a) { (void)a; return OK; }
int attroff(attr_t a) { (void)a; return OK; }
int attrset(attr_t a) { (void)a; return OK; }
int attr_get(attr_t *a, short *p, void *o) {
  if (a) *a = A_NORMAL;
  if (p) *p = 0;
  (void)o;
  return OK;
}
int attr_on(attr_t a, void *o) { (void)a; (void)o; return OK; }
int attr_off(attr_t a, void *o) { (void)a; (void)o; return OK; }
int chgat(int n, attr_t a, short p, const void *o) { (void)n; (void)a; (void)p; (void)o; return OK; }
int mvchgat(int y, int x, int n, attr_t a, short p, const void *o) {
  (void)y; (void)x; (void)n; (void)a; (void)p; (void)o;
  return OK;
}
int start_color(void) { return OK; }
int use_default_colors(void) { return OK; }
int init_pair(short pr, short f, short b) { (void)pr; (void)f; (void)b; return OK; }
bool has_colors(void) { return false; }
int napms(int ms) { (void)ms; return OK; }
int getcury(const WINDOW *w) { (void)w; return 0; }
int getcurx(const WINDOW *w) { (void)w; return 0; }
int getmaxy(const WINDOW *w) { (void)w; return LINES; }
int getmaxx(const WINDOW *w) { (void)w; return COLS; }
