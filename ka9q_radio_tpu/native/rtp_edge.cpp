// rtp_edge — native host-edge RTP packetizer for the TPU radiod.
//
// The reference's audio.c runs one send_output per channel per block in its
// demod thread. Our host edge is a single Python loop; at 1000+ channels x
// 50 blocks/s the per-channel numpy conversion + sendto() syscalls dominate
// host CPU. This module packetizes an entire [C, N] block of float audio in
// one call — PCM conversion (s16be / f32be / G.711 mu-law / A-law), RTP
// header assembly (wire format per rtp.c hton_rtp), and one sendmmsg(2)
// batch for all channels — updating per-channel seq/timestamp in place.
//
// Build: g++ -O3 -shared -fPIC rtp_edge.cpp -o librtp_edge.so (see edge.py)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

#include <dlfcn.h>
#include <unordered_map>

#include <sys/socket.h>
#include <netinet/in.h>
#include <netinet/ip.h>
#include <arpa/inet.h>
#include <unistd.h>

namespace {

constexpr int MAX_PAYLOAD = 1408;  // samples bytes per packet (under MTU)

struct Packet {
  uint8_t buf[12 + MAX_PAYLOAD];
  size_t len;
};

inline void put_rtp_header(uint8_t *b, uint8_t pt, bool marker, uint16_t seq,
                           uint32_t ts, uint32_t ssrc) {
  b[0] = 0x80;  // V=2, no pad/ext/csrc
  b[1] = (pt & 0x7f) | (marker ? 0x80 : 0);
  b[2] = seq >> 8;
  b[3] = seq & 0xff;
  b[4] = ts >> 24; b[5] = ts >> 16; b[6] = ts >> 8; b[7] = ts;
  b[8] = ssrc >> 24; b[9] = ssrc >> 16; b[10] = ssrc >> 8; b[11] = ssrc;
}

inline int16_t f2s16(float x) {
  float v = x * 32767.0f;
  if (v > 32767.0f) v = 32767.0f;
  if (v < -32768.0f) v = -32768.0f;
  return (int16_t)lrintf(v);
}

inline uint8_t mulaw(float x) {
  const int BIAS = 0x84, CLIP = 32635;
  int s = (int)lrintf(x * 32767.0f);
  int sign = 0;
  if (s < 0) { s = -s; sign = 0x80; }
  if (s > CLIP) s = CLIP;
  s += BIAS;
  int exp = 7;
  for (int m = 0x4000; (s & m) == 0 && exp > 0; exp--, m >>= 1) {}
  int mant = (s >> (exp + 3)) & 0x0f;
  return (uint8_t)~(sign | (exp << 4) | mant);
}

inline uint8_t alaw(float x) {
  int s = (int)lrintf(x * 32767.0f);
  int sign = 0;
  if (s < 0) { s = -s; sign = 0x80; }
  if (s > 32635) s = 32635;
  int exp = 7;
  for (int m = 0x4000; (s & m) == 0 && exp > 0; exp--, m >>= 1) {}
  int mant = (exp == 0) ? (s >> 4) & 0x0f : (s >> (exp + 3)) & 0x0f;
  return (uint8_t)((sign | (exp << 4) | mant) ^ 0xD5);
}

// encoding codes match net/rtp.py Encoding
enum { E_S16LE = 1, E_S16BE = 2, E_OPUS = 3, E_F32LE = 4, E_F16LE = 6,
       E_OPUS_VOIP = 7, E_F32BE = 8, E_F16BE = 9, E_MULAW = 10, E_ALAW = 11 };

// ---- Opus via dlopen("libopus.so.0") — headers absent in this image, the
// runtime library is not; the ABI is stable public API ----
struct OpusEncoderS;  // opaque
typedef OpusEncoderS *(*opus_create_t)(int32_t, int, int, int *);
typedef int32_t (*opus_encode_float_t)(OpusEncoderS *, const float *, int,
                                       unsigned char *, int32_t);
typedef void (*opus_destroy_t)(OpusEncoderS *);
typedef int (*opus_ctl_t)(OpusEncoderS *, int, ...);

struct OpusApi {
  void *dl = nullptr;
  opus_create_t create = nullptr;
  opus_encode_float_t encode = nullptr;
  opus_destroy_t destroy = nullptr;
  opus_ctl_t ctl = nullptr;
  bool ok() const { return create && encode && destroy && ctl; }
};

OpusApi &opus_api() {
  static OpusApi api = [] {
    OpusApi a;
    a.dl = dlopen("libopus.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (a.dl) {
      a.create = (opus_create_t)dlsym(a.dl, "opus_encoder_create");
      a.encode = (opus_encode_float_t)dlsym(a.dl, "opus_encode_float");
      a.destroy = (opus_destroy_t)dlsym(a.dl, "opus_encoder_destroy");
      a.ctl = (opus_ctl_t)dlsym(a.dl, "opus_encoder_ctl");
    }
    return a;
  }();
  return api;
}

struct OpusSlot {
  OpusEncoderS *enc = nullptr;
  int samprate = 0;
  int nch = 0;
  int app = 0;      // OPUS_APPLICATION value (0 = derive from encoding)
  int bitrate = -1; // applied OPUS_SET_BITRATE (-1 = untouched)
  int dtx = -1;     // applied OPUS_SET_DTX
};
// per-(socket, channel) encoder states; freed by rtp_edge_close
std::unordered_map<uint64_t, OpusSlot> Opus_slots;
// per-socket data destination (sockets are UNCONNECTED so audio and the
// status-port beacons share one source port — stock ka9q clients match
// data<->status sessions on it, pcmrecord.c process_status)
std::unordered_map<int, sockaddr_in> Edge_dest;

inline uint64_t slot_key(int fd, int chan) {
  return ((uint64_t)(uint32_t)fd << 32) | (uint32_t)chan;
}

size_t sample_bytes(int enc) {
  switch (enc) {
    case E_MULAW: case E_ALAW: return 1;
    case E_S16LE: case E_S16BE: case E_F16LE: case E_F16BE: return 2;
    default: return 4;
  }
}

inline uint16_t f2h(float f) {  // float32 -> IEEE half, round to nearest even
  uint32_t x; memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000;
  int32_t exp = (int32_t)((x >> 23) & 0xff) - 127 + 15;
  uint32_t mant = x & 0x7fffff;
  if (exp <= 0) return (uint16_t)sign;                       // flush to zero
  if (exp >= 31) return (uint16_t)(sign | 0x7c00);           // inf/overflow
  uint32_t h = (uint32_t)(exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1fff;
  if (rem > 0x1000 || (rem == 0x1000 && (h & 1))) h++;       // may carry into exp
  return (uint16_t)(sign | h);
}

size_t encode(const float *src, size_t n, int enc, uint8_t *dst) {
  switch (enc) {
    case E_S16BE:
      for (size_t i = 0; i < n; i++) { int16_t v = f2s16(src[i]); dst[2*i] = v >> 8; dst[2*i+1] = v & 0xff; }
      return 2 * n;
    case E_S16LE:
      for (size_t i = 0; i < n; i++) { int16_t v = f2s16(src[i]); dst[2*i] = v & 0xff; dst[2*i+1] = (uint16_t)v >> 8; }
      return 2 * n;
    case E_MULAW:
      for (size_t i = 0; i < n; i++) dst[i] = mulaw(src[i]);
      return n;
    case E_ALAW:
      for (size_t i = 0; i < n; i++) dst[i] = alaw(src[i]);
      return n;
    case E_F16LE:
      for (size_t i = 0; i < n; i++) { uint16_t h = f2h(src[i]); dst[2*i] = h & 0xff; dst[2*i+1] = h >> 8; }
      return 2 * n;
    case E_F16BE:
      for (size_t i = 0; i < n; i++) { uint16_t h = f2h(src[i]); dst[2*i] = h >> 8; dst[2*i+1] = h & 0xff; }
      return 2 * n;
    case E_F32BE:
      for (size_t i = 0; i < n; i++) {
        uint32_t v; memcpy(&v, &src[i], 4);
        dst[4*i] = v >> 24; dst[4*i+1] = v >> 16; dst[4*i+2] = v >> 8; dst[4*i+3] = v;
      }
      return 4 * n;
    default:  // F32LE
      memcpy(dst, src, 4 * n);
      return 4 * n;
  }
}

}  // namespace

extern "C" {

// UDP sender socket connected to ip:port; multicast TTL + loopback set.
int rtp_edge_open(const char *ip, int port, int ttl, int tos) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  if (tos) setsockopt(fd, IPPROTO_IP, IP_TOS, &tos, sizeof tos);
  sockaddr_in sa{};
  sa.sin_family = AF_INET;
  sa.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, ip, &sa.sin_addr) != 1) { close(fd); return -2; }
  uint32_t a = ntohl(sa.sin_addr.s_addr);
  if (a >= 0xE0000000u && a < 0xF0000000u) {
    unsigned char t = (unsigned char)(ttl < 0 ? 0 : ttl);
    setsockopt(fd, IPPROTO_IP, IP_MULTICAST_TTL, &t, sizeof t);
    unsigned char loop = 1;
    setsockopt(fd, IPPROTO_IP, IP_MULTICAST_LOOP, &loop, sizeof loop);
  }
  int sz = 4 << 20;
  setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sz, sizeof sz);
  Edge_dest[fd] = sa;  // unconnected: sendmmsg carries the address
  return fd;
}

// Send one control/status packet from the SAME socket (and source port)
// as the audio, to the data group's `port` (the beacon path).
int rtp_edge_send_ctl(int fd, const uint8_t *buf, int len, int port) {
  auto it = Edge_dest.find(fd);
  if (it == Edge_dest.end()) return -1;
  sockaddr_in dst = it->second;
  dst.sin_port = htons((uint16_t)port);
  ssize_t r = sendto(fd, buf, (size_t)len, 0, (sockaddr *)&dst, sizeof dst);
  return r < 0 ? -1 : (int)r;
}

void rtp_edge_close(int fd) {
  for (auto it = Opus_slots.begin(); it != Opus_slots.end();) {
    if ((int)(it->first >> 32) == fd) {
      if (it->second.enc) opus_api().destroy(it->second.enc);
      it = Opus_slots.erase(it);
    } else {
      ++it;
    }
  }
  Edge_dest.erase(fd);
  close(fd);
}

int rtp_edge_has_opus(void) { return opus_api().ok() ? 1 : 0; }

// Packetize + send one block of audio for C channels.
//   audio: [C, nframes * nch] float32 (interleaved if nch=2)
//   send/marker flags, ssrc/pt/encoding/samprate per channel; seq/ts updated
//   in place. ts advances by nframes even for muted channels (audio.c
//   semantics); Opus timestamps tick at 48 kHz regardless of samprate.
// Returns packets sent, or -errno on socket failure.
int rtp_edge_send_block(int fd, const float *audio, int nchan, int nframes,
                        int nch, const uint8_t *send_flag, const uint32_t *ssrc,
                        const uint8_t *pt, const int32_t *encoding,
                        const int32_t *samprate,
                        const int32_t *opus_bitrate, const uint8_t *opus_dtx,
                        const int32_t *opus_app,
                        uint16_t *seq, uint32_t *ts, const uint8_t *marker) {
  std::vector<Packet> pkts;
  pkts.reserve((size_t)nchan * 2);

  // ---- Opus channels: slot management serial, ENCODE IN PARALLEL ----
  // libopus encode is ~0.15 ms/channel: serial tops out near 120 real-time
  // channels, so the per-channel encodes (independent encoder states) fan
  // out over a thread pool — the edge analog of the reference's
  // demod-thread-per-channel encode (audio.c runs in each channel thread).
  std::vector<int> opus_jobs;
  for (int c = 0; c < nchan; c++) {
    bool is_opus = encoding[c] == E_OPUS || encoding[c] == E_OPUS_VOIP;
    if (!is_opus)
      continue;
    uint32_t ts_inc = samprate[c] > 0
                          ? (uint32_t)((int64_t)nframes * 48000 / samprate[c])
                          : (uint32_t)nframes;
    if (!send_flag[c]) {
      ts[c] += ts_inc;
      continue;
    }
    OpusApi &api = opus_api();
    if (!api.ok()) { ts[c] += ts_inc; continue; }
    OpusSlot &slot = Opus_slots[slot_key(fd, c)];
    int want_app = opus_app[c] ? opus_app[c]
                               : (encoding[c] == E_OPUS_VOIP ? 2048 : 2049);
    if (slot.enc == nullptr || slot.samprate != samprate[c] ||
        slot.nch != nch || slot.app != want_app) {
      if (slot.enc) api.destroy(slot.enc);
      int err = 0;
      slot.enc = api.create(samprate[c], nch, want_app, &err);
      slot.samprate = samprate[c];
      slot.nch = nch;
      slot.app = want_app;
      slot.bitrate = slot.dtx = -1;
      if (err != 0 || slot.enc == nullptr) { slot.enc = nullptr; ts[c] += ts_inc; continue; }
    }
    if (slot.bitrate != opus_bitrate[c]) {  // OPUS_SET_BITRATE=4002; 0 -> AUTO
      api.ctl(slot.enc, 4002, (int32_t)(opus_bitrate[c] > 0 ? opus_bitrate[c] : -1000));
      slot.bitrate = opus_bitrate[c];
    }
    if (slot.dtx != (int)opus_dtx[c]) {  // OPUS_SET_DTX=4016
      api.ctl(slot.enc, 4016, (int32_t)opus_dtx[c]);
      slot.dtx = (int)opus_dtx[c];
    }
    opus_jobs.push_back(c);
  }
  std::vector<Packet> opus_pkts(opus_jobs.size());
  if (!opus_jobs.empty()) {
    OpusApi &api = opus_api();
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 2;
    if (nthreads > opus_jobs.size()) nthreads = (unsigned)opus_jobs.size();
    auto worker = [&](unsigned w) {
      for (size_t j = w; j < opus_jobs.size(); j += nthreads) {
        int c = opus_jobs[j];
        // read-only find (operator[] could insert -> data race); phase 1
        // guaranteed the slot exists for every job
        OpusSlot &slot = Opus_slots.find(slot_key(fd, c))->second;
        Packet &p = opus_pkts[j];
        const float *src = audio + (size_t)c * nframes * nch;
        int32_t r = api.encode(slot.enc, src, nframes, p.buf + 12, MAX_PAYLOAD);
        p.len = r > 0 ? 12 + (size_t)r : 0;
      }
    };
    if (nthreads <= 1) {
      worker(0);
    } else {
      std::vector<std::thread> threads;
      for (unsigned w = 1; w < nthreads; w++) threads.emplace_back(worker, w);
      worker(0);
      for (auto &t : threads) t.join();
    }
    for (size_t j = 0; j < opus_jobs.size(); j++) {
      int c = opus_jobs[j];
      uint32_t ts_inc = samprate[c] > 0
                            ? (uint32_t)((int64_t)nframes * 48000 / samprate[c])
                            : (uint32_t)nframes;
      if (opus_pkts[j].len == 0) { ts[c] += ts_inc; continue; }
      put_rtp_header(opus_pkts[j].buf, pt[c], marker[c], seq[c], ts[c], ssrc[c]);
      seq[c] = (uint16_t)(seq[c] + 1);
      ts[c] += ts_inc;
      pkts.push_back(opus_pkts[j]);
    }
  }

  for (int c = 0; c < nchan; c++) {
    bool is_opus = encoding[c] == E_OPUS || encoding[c] == E_OPUS_VOIP;
    if (is_opus)
      continue;  // handled above
    uint32_t ts_inc = (uint32_t)nframes;
    if (!send_flag[c]) {
      ts[c] += ts_inc;
      continue;
    }
    size_t bytes_per_frame = sample_bytes(encoding[c]) * (size_t)nch;
    int frames_per_pkt = (int)(MAX_PAYLOAD / bytes_per_frame);
    if (frames_per_pkt < 1) frames_per_pkt = 1;
    const float *src = audio + (size_t)c * nframes * nch;
    for (int off = 0; off < nframes; off += frames_per_pkt) {
      int n = nframes - off;
      if (n > frames_per_pkt) n = frames_per_pkt;
      pkts.emplace_back();
      Packet &p = pkts.back();
      put_rtp_header(p.buf, pt[c], marker[c] && off == 0, seq[c], ts[c], ssrc[c]);
      size_t plen = encode(src + (size_t)off * nch, (size_t)n * nch, encoding[c], p.buf + 12);
      p.len = 12 + plen;
      seq[c] = (uint16_t)(seq[c] + 1);
      ts[c] += (uint32_t)n;
    }
  }
  if (pkts.empty()) return 0;

  auto dit = Edge_dest.find(fd);
  if (dit == Edge_dest.end()) return -1;
  std::vector<mmsghdr> hdrs(pkts.size());
  std::vector<iovec> iovs(pkts.size());
  for (size_t i = 0; i < pkts.size(); i++) {
    iovs[i] = {pkts[i].buf, pkts[i].len};
    std::memset(&hdrs[i], 0, sizeof(mmsghdr));
    hdrs[i].msg_hdr.msg_iov = &iovs[i];
    hdrs[i].msg_hdr.msg_iovlen = 1;
    hdrs[i].msg_hdr.msg_name = (void *)&dit->second;
    hdrs[i].msg_hdr.msg_namelen = sizeof(sockaddr_in);
  }
  size_t done = 0;
  while (done < hdrs.size()) {
    int r = sendmmsg(fd, hdrs.data() + done, (unsigned)(hdrs.size() - done), 0);
    if (r <= 0) return -(int)done;  // partial send; caller may count
    done += (size_t)r;
  }
  return (int)pkts.size();
}

}  // extern "C"
