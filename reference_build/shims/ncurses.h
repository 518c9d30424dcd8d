/* Minimal ncurses header shim for the HEADLESS stock-monitor build
 * (`monitor -q`, monitor.c:441-444: the display thread is never started,
 * so every curses call below is link-time-only).  Declares the public
 * curses API surface monitor*.c reference; all implementations are no-op
 * stubs in ncurses_stub.c.  Original code — API names only.
 */
#ifndef NCURSES_SHIM_H
#define NCURSES_SHIM_H 1

#include <stdbool.h>
#include <stdarg.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct _win_st WINDOW;
typedef struct screen SCREEN;
typedef unsigned long chtype;
typedef chtype attr_t;

#define ERR (-1)
#define OK (0)
#ifndef TRUE
#define TRUE true
#endif
#ifndef FALSE
#define FALSE false
#endif

extern WINDOW *stdscr;
extern WINDOW *curscr;
extern int COLS;
extern int LINES;

/* attributes (bit layout mirrors the public ABI convention) */
#define NCURSES_ATTR_SHIFT 8
#define NCURSES_BITS(mask, shift) ((mask) << ((shift) + NCURSES_ATTR_SHIFT))
#define A_NORMAL 0UL
#define A_STANDOUT NCURSES_BITS(1UL, 8)
#define A_UNDERLINE NCURSES_BITS(1UL, 9)
#define A_REVERSE NCURSES_BITS(1UL, 10)
#define A_BLINK NCURSES_BITS(1UL, 11)
#define A_DIM NCURSES_BITS(1UL, 12)
#define A_BOLD NCURSES_BITS(1UL, 13)
#define A_COLOR NCURSES_BITS((1UL << 8) - 1UL, 0)
#define COLOR_PAIR(n) (NCURSES_BITS((chtype)(n), 0) & A_COLOR)

/* function keys */
#define KEY_DOWN 0402
#define KEY_UP 0403
#define KEY_LEFT 0404
#define KEY_RIGHT 0405
#define KEY_HOME 0406
#define KEY_BACKSPACE 0407
#define KEY_F0 0410
#define KEY_F(n) (KEY_F0 + (n))
#define KEY_DC 0512
#define KEY_IC 0513
#define KEY_NPAGE 0522
#define KEY_PPAGE 0523
#define KEY_ENTER 0527
#define KEY_END 0550
#define KEY_MOUSE 0631
#define KEY_RESIZE 0632
#define KEY_BTAB 0541
#define KEY_SLEFT 0611
#define KEY_SRIGHT 0622

WINDOW *initscr(void);
int endwin(void);
int noecho(void);
int echo(void);
int cbreak(void);
int nocbreak(void);
int raw(void);
int keypad(WINDOW *win, bool bf);
void timeout(int delay);
int wtimeout_(WINDOW *win, int delay);
int nodelay(WINDOW *win, bool bf);
int clearok(WINDOW *win, bool bf);
int curs_set(int visibility);
int getch(void);
int ungetch(int ch);
int move(int y, int x);
int addch(const chtype ch);
int addstr(const char *str);
int addnstr(const char *str, int n);
int mvaddch(int y, int x, const chtype ch);
int mvaddstr(int y, int x, const char *str);
int mvaddnstr(int y, int x, const char *str, int n);
int printw(const char *fmt, ...);
int mvprintw(int y, int x, const char *fmt, ...);
int beep(void);
int flash(void);
int erase(void);
int clear(void);
int clrtoeol(void);
int clrtobot(void);
int refresh(void);
int attron(attr_t attrs);
int attroff(attr_t attrs);
int attrset(attr_t attrs);
int attr_get(attr_t *attrs, short *pair, void *opts);
int attr_on(attr_t attrs, void *opts);
int attr_off(attr_t attrs, void *opts);
int chgat(int n, attr_t attr, short pair, const void *opts);
int mvchgat(int y, int x, int n, attr_t attr, short pair, const void *opts);
int start_color(void);
int use_default_colors(void);
int init_pair(short pair, short f, short b);
bool has_colors(void);
int napms(int ms);
int getcury(const WINDOW *win);
int getcurx(const WINDOW *win);
int getmaxy(const WINDOW *win);
int getmaxx(const WINDOW *win);

#define getyx(win, y, x) ((y) = getcury(win), (x) = getcurx(win))
#define getmaxyx(win, y, x) ((y) = getmaxy(win), (x) = getmaxx(win))

#ifdef __cplusplus
}
#endif
#endif
