#!/bin/bash
# Build the reference radiod (+ sig_gen front-end plugin and the tune/
# pcmrecord-style capture path) from /root/reference/src OUT OF TREE, using
# the API shims in shims/ for the dev packages this image lacks
# (libfftw3f-dev, libiniparser-dev, libopus-dev headers, libbsd-dev).
# Output: $BUILD/radiod and $BUILD/sig_gen.so
#
# Used by capture_golden.py to produce the golden-parity captures that
# tests/test_reference_parity.py checks our TPU pipeline against
# (BASELINE.md acceptance bound: within 0.1 dB of radiod/sig_gen).
set -euo pipefail

SRC=/root/reference/src
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="${1:-/tmp/refbuild}"
mkdir -p "$BUILD/lib"

# dev-symlink the runtime .so.0 libraries so -lopus/-lbsd resolve
ln -sf /lib/x86_64-linux-gnu/libopus.so.0 "$BUILD/lib/libopus.so"
ln -sf /lib/x86_64-linux-gnu/libbsd.so.0 "$BUILD/lib/libbsd.so"
ln -sf /lib/x86_64-linux-gnu/libogg.so.0 "$BUILD/lib/libogg.so"

# the Makefile-generated header (paths + git stamps); PKGLIBDIR points at
# the build dir so radiod's dlopen finds our sig_gen.so plugin
cat > "$BUILD/config_paths.h" <<EOF
#ifndef _CONFIG_PATHS_H
#define _CONFIG_PATHS_H 1
#define CONFDIR "$BUILD/conf"
#define STATEDIR "$BUILD/state"
#define PKGDATADIR "/root/reference/share"
#define PKGLIBDIR "$BUILD"
#define GIT_HASH "shim"
#define GIT_TIME "shim"
#define GIT_BRANCH "shim"
#define GIT_SUMMARY "shim"
#define GIT_VERSION "shim"
#define GIT_REMOTE_URL "shim"
#endif
EOF
mkdir -p "$BUILD/conf" "$BUILD/state"

CFLAGS="-std=gnu11 -pthread -O2 -fPIC -fcx-limited-range -fno-math-errno \
  -funsafe-math-optimizations -freciprocal-math -fno-trapping-math \
  -DNDEBUG=1 -I$BUILD -I$HERE/shims -I$SRC -Wno-deprecated-declarations -w"

cd "$BUILD"

# shims
gcc $CFLAGS -c "$HERE/shims/fftw_shim.c" -o fftw_shim.o
gcc $CFLAGS -c "$HERE/shims/iniparser_shim.c" -o iniparser_shim.o

RADIOD_SRCS="main audio avahi modes fm wfm linear spectrum radio radio_status \
  rtcp misc multicast rtp config filter iir window osc sincospi sincospif \
  status decode_status"
for f in $RADIOD_SRCS; do
  gcc $CFLAGS -c "$SRC/$f.c" -o "$f.o"
done

gcc -rdynamic -pthread -o radiod $(for f in $RADIOD_SRCS; do echo "$f.o"; done) \
  fftw_shim.o iniparser_shim.o \
  -L"$BUILD/lib" -Wl,-rpath,/lib/x86_64-linux-gnu -lopus -lbsd -ldl -lm

# the reference's own CLIENTS, to drive against OUR daemon (interop in
# the consumer direction: a stock ka9q user pointing stock tools at us)
for f in tune metadump powers dump pcmcat; do
  gcc $CFLAGS -c "$SRC/$f.c" -o "$f.o"
done
for exe in tune metadump powers pcmcat; do
  gcc -pthread -o "$exe" "$exe.o" dump.o status.o decode_status.o misc.o \
    multicast.o rtp.o config.o iniparser_shim.o \
    -L"$BUILD/lib" -Wl,-rpath,/lib/x86_64-linux-gnu -lopus -lbsd -lm
done
gcc $CFLAGS -c "$SRC/pcmrecord.c" -o pcmrecord.o
gcc $CFLAGS -c "$SRC/wd-record.c" -o wd-record.o
gcc $CFLAGS -c "$SRC/attr.c" -o attr.o
for exe in pcmrecord wd-record; do
  gcc -pthread -o "$exe" "$exe.o" attr.o status.o decode_status.o misc.o \
    multicast.o rtp.o config.o iniparser_shim.o \
    -L"$BUILD/lib" -Wl,-rpath,/lib/x86_64-linux-gnu -lopus -logg -lbsd -lm
done
echo "built: $BUILD/{tune,metadump,powers,pcmcat,pcmrecord,wd-record}"

# the stock MONITOR, headless build (-q --pipe): curses/portaudio/alsa are
# link-time-only on that path, provided by no-op stubs; libsamplerate's
# resampler is bypassed for 48 kHz streams (monitor-data.c:731-733), which
# is all the interop test plays
gcc $CFLAGS -c "$HERE/shims/portaudio_stub.c" -o portaudio_stub.o
gcc $CFLAGS -c "$HERE/shims/ncurses_stub.c" -o ncurses_stub.o
gcc $CFLAGS -c "$HERE/shims/samplerate_stub.c" -o samplerate_stub.o
MONITOR_SRCS="monitor monitor-data monitor-display monitor-repeater morse"
for f in $MONITOR_SRCS; do
  gcc $CFLAGS -c "$SRC/$f.c" -o "$f.o"
done
gcc -pthread -o monitor $(for f in $MONITOR_SRCS; do echo "$f.o"; done) \
  status.o decode_status.o misc.o multicast.o rtp.o config.o iir.o osc.o \
  sincospi.o sincospif.o \
  iniparser_shim.o portaudio_stub.o ncurses_stub.o samplerate_stub.o \
  -L"$BUILD/lib" -Wl,-rpath,/lib/x86_64-linux-gnu -lopus -lbsd -lm
echo "built: $BUILD/monitor (headless: -q --pipe)"

# the sig_gen synthetic front end, as the dlopen plugin radiod expects
gcc $CFLAGS -c "$SRC/sig_gen.c" -o sig_gen_p.o
gcc $CFLAGS -c "$SRC/gauss.c" -o gauss_p.o
gcc -shared -o sig_gen.so sig_gen_p.o gauss_p.o -lm

# file-playback front end (ORIGINAL shim code, shims/file.c): plays a raw
# float32 capture into radiod through the same plugin seam — lets the
# golden captures exercise demods sig_gen can't drive (WFM stereo: its FM
# modulation is unimplemented upstream, sig_gen.c:291)
gcc $CFLAGS -c "$HERE/shims/file.c" -o file_p.o
gcc -shared -o file.so file_p.o -lm

echo "built: $BUILD/radiod + $BUILD/sig_gen.so + $BUILD/file.so"

# LD_PRELOAD stub that keeps radiod off SCHED_FIFO (no RT runtime in this
# container's cgroup -> FIFO threads starve); capture_golden.py preloads it
gcc -shared -fPIC -o "$BUILD/nort.so" "$HERE/shims/nort.c"
echo "built: $BUILD/nort.so"
