// edge_selftest — sanitizer harness for the native RTP edge.
//
// The reference ships `make SANITIZE=1` (ASan+UBSan, src/Makefile:50-54)
// as its memory/race story for the C side. This is the analog for our one
// native component: a standalone binary compiled with
// -fsanitize=address,undefined that drives every encode path, the packet
// splitter, and the Opus slot lifecycle against a loopback socket.
// tests/test_native.py builds and runs it; a sanitizer report is a
// non-zero exit.
//
// Build: g++ -std=c++17 -O1 -g -fsanitize=address,undefined \
//            edge_selftest.cpp rtp_edge.cpp -o edge_selftest -ldl

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

#include <sys/socket.h>
#include <netinet/in.h>
#include <arpa/inet.h>
#include <unistd.h>

extern "C" {
int rtp_edge_open(const char *ip, int port, int ttl, int tos);
void rtp_edge_close(int fd);
int rtp_edge_has_opus(void);
int rtp_edge_send_block(int fd, const float *audio, int nchan, int nframes,
                        int nch, const uint8_t *send_flag, const uint32_t *ssrc,
                        const uint8_t *pt, const int32_t *encoding,
                        const int32_t *samprate,
                        const int32_t *opus_bitrate, const uint8_t *opus_dtx,
                        const int32_t *opus_app,
                        uint16_t *seq, uint32_t *ts, const uint8_t *marker);
int rtp_ingest_open(const char *ip, int port, int encoding, int width,
                    uint32_t ssrc, int ring_log2, int rcvbuf_mb);
long rtp_ingest_read(int h, float *dst, long nfloats, int timeout_ms);
void rtp_ingest_stats(int h, long long *out);
void rtp_ingest_close(int h);
long long rtp_ingest_blast(const char *ip, int port, int encoding, int width,
                           uint32_t ssrc, int frames_per_pkt,
                           long long nframes, long long pace_fps, int ttl);
}

int main() {
  // loopback receiver so the sends complete
  int rx = socket(AF_INET, SOCK_DGRAM, 0);
  sockaddr_in sa{};
  sa.sin_family = AF_INET;
  sa.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  sa.sin_port = 0;
  if (bind(rx, (sockaddr *)&sa, sizeof sa) < 0) { perror("bind"); return 2; }
  socklen_t sl = sizeof sa;
  getsockname(rx, (sockaddr *)&sa, &sl);
  int port = ntohs(sa.sin_port);

  int fd = rtp_edge_open("127.0.0.1", port, 1, 0);
  if (fd < 0) { fprintf(stderr, "open fail %d\n", fd); return 2; }

  const int C = 8, NFRAMES = 960, NCH = 2;
  std::vector<float> audio((size_t)C * NFRAMES * NCH);
  for (size_t i = 0; i < audio.size(); i++)
    audio[i] = sinf(0.02f * (float)i) * ((i % 7) ? 1.0f : 37.0f);  // incl. clipping
  std::vector<uint8_t> send(C, 1), marker(C, 1), pt(C, 122);
  std::vector<uint32_t> ssrc(C), ts(C, 0xFFFFFF00u);  // near ts wrap
  std::vector<uint16_t> seq(C, 0xFFFE);               // near seq wrap
  std::vector<int32_t> enc(C), rate(C, 12000);
  std::vector<int32_t> obr(C, 0), oapp(C, 0);
  std::vector<uint8_t> odtx(C, 0);
  for (int c = 0; c < C; c++) ssrc[c] = 100 + c;

  // every PCM encoding incl. odd ones, plus muted channels
  const int encs[] = {1, 2, 4, 6, 8, 9, 10, 11};
  for (int round = 0; round < 4; round++) {
    for (int c = 0; c < C; c++) {
      enc[c] = encs[(c + round) % 8];
      send[c] = (uint8_t)((c + round) % 3 != 0);
    }
    int n = rtp_edge_send_block(fd, audio.data(), C, NFRAMES, NCH, send.data(),
                                ssrc.data(), pt.data(), enc.data(), rate.data(),
                                obr.data(), odtx.data(), oapp.data(),
                                seq.data(), ts.data(), marker.data());
    if (n < 0) { fprintf(stderr, "send fail %d\n", n); return 2; }
  }
  // single-frame edge case and 1-channel layout
  rtp_edge_send_block(fd, audio.data(), C, 1, 1, send.data(), ssrc.data(),
                      pt.data(), enc.data(), rate.data(),
                      obr.data(), odtx.data(), oapp.data(),
                      seq.data(), ts.data(), marker.data());

  if (rtp_edge_has_opus()) {
    for (int c = 0; c < C; c++) { enc[c] = (c % 2) ? 3 : 7; send[c] = 1; rate[c] = 48000; }
    for (int round = 0; round < 3; round++)
      rtp_edge_send_block(fd, audio.data(), C, NFRAMES, NCH, send.data(),
                          ssrc.data(), pt.data(), enc.data(), rate.data(),
                          obr.data(), odtx.data(), oapp.data(),
                          seq.data(), ts.data(), marker.data());
    // knob changes exercise the ctl path and encoder recreation
    for (int c = 0; c < C; c++) { rate[c] = 24000; obr[c] = 32000; odtx[c] = 1; oapp[c] = 2048; }
    rtp_edge_send_block(fd, audio.data(), C, 480, NCH, send.data(), ssrc.data(),
                        pt.data(), enc.data(), rate.data(),
                        obr.data(), odtx.data(), oapp.data(),
                        seq.data(), ts.data(), marker.data());
  }

  rtp_edge_close(fd);  // frees the Opus slots
  close(rx);

  // ---- ingest surface: reader thread, ring wrap, malformed packets ----
  {
    int iport = 48765;
    int ih = rtp_ingest_open("127.0.0.1", iport, 2 /*s16be*/, 1, 0,
                             14 /*16k-float ring -> forced wrap*/, 4);
    if (ih < 0) { fprintf(stderr, "ingest open fail %d\n", ih); return 2; }
    // malformed garbage + truncated headers must be rejected cleanly
    int tx = socket(AF_INET, SOCK_DGRAM, 0);
    sockaddr_in da{};
    da.sin_family = AF_INET;
    da.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    da.sin_port = htons((uint16_t)iport);
    uint8_t junk[32] = {0};
    sendto(tx, junk, 4, 0, (sockaddr *)&da, sizeof da);
    junk[0] = 0x80;
    sendto(tx, junk, 11, 0, (sockaddr *)&da, sizeof da);
    junk[0] = 0x9f;  // version 2, 15 CSRCs + extension, but tiny packet
    sendto(tx, junk, 16, 0, (sockaddr *)&da, sizeof da);
    // real traffic: enough frames to wrap the 16k ring several times
    rtp_ingest_blast("127.0.0.1", iport, 2, 1, 7, 704, 200000, 0, 0);
    std::vector<float> out(4096);
    long long total = 0;
    for (int i = 0; i < 8; i++)
      total += rtp_ingest_read(ih, out.data(), (long)out.size(), 50);
    long long st[8];
    rtp_ingest_stats(ih, st);
    if (st[6] < 2) { fprintf(stderr, "malformed not counted\n"); return 2; }
    (void)total;
    rtp_ingest_close(ih);  // joins the reader thread
    close(tx);
  }
  printf("edge_selftest OK\n");
  return 0;
}
