"""Live wire interop with the REAL reference radiod.

Beyond golden captures (test_reference_parity), this drives the actual
reference binary with OUR clients over UDP multicast: tune-tpu commands
it, pcmrecord-style RTP capture decodes its audio, metadump/TLV decode
reads its beacons. Proves both directions of the protocol surface
against the true implementation. Skips when the reference build is
unavailable (it builds from /root/reference via reference_build/).
"""
import os
import select
import signal
import subprocess
import time

import numpy as np
import pytest

from ka9q_radio_tpu.net.multicast import resolve_dest, listen_socket
from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, decode_samples
from ka9q_radio_tpu.net.status import StatusType as T, PacketType, decode_status, dump_text

BUILD = "/tmp/refbuild"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TAG = f"interop-{os.getpid()}"

CONF = f"""
[global]
hardware = sig_gen
status = {TAG}-st.local
data = {TAG}-pcm.local
update = 10
ttl = 1
advertise = no

[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
carrier = 51k
amplitude = -20
noise = -140

[hf]
mode = usb
samprate = 12k
freq = 50k0
"""


@pytest.fixture(scope="module")
def ref_radiod():
    if not os.path.exists(os.path.join(BUILD, "radiod")):
        try:
            subprocess.run(["bash", os.path.join(REPO, "reference_build", "build_reference.sh"),
                            BUILD], check=True, capture_output=True, timeout=300)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
            pytest.skip(f"reference build unavailable: {e}")
    cfile = f"/tmp/{TAG}.conf"
    with open(cfile, "w") as f:
        f.write(CONF)
    errlog = open(f"/tmp/{TAG}.err", "wb")
    env = {**os.environ, "LD_PRELOAD": os.path.join(BUILD, "nort.so")}
    proc = subprocess.Popen([os.path.join(BUILD, "radiod"), cfile],
                            stdout=subprocess.DEVNULL, stderr=errlog, env=env)
    time.sleep(2.0)
    if proc.poll() is not None:
        pytest.skip(f"reference radiod exited {proc.returncode}")
    yield proc
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(3)
    except subprocess.TimeoutExpired:
        proc.kill()


def _collect(sock, seconds, pred=None):
    out = []
    t_end = time.time() + seconds
    while time.time() < t_end:
        r, _, _ = select.select([sock], [], [], 0.3)
        if r:
            pkt, _ = sock.recvfrom(65536)
            if pred is None or pred(pkt):
                out.append(pkt)
    return out


def test_our_rtp_and_tlv_stacks_decode_reference_output(ref_radiod):
    rtp = listen_socket(resolve_dest(f"{TAG}-pcm.local", 5004))
    st = listen_socket(resolve_dest(f"{TAG}-pcm.local", 5006))
    pkts = _collect(rtp, 3.0)
    assert len(pkts) > 50, "no RTP from reference radiod"
    audio = []
    for p in pkts:
        h, payload = RtpHeader.unpack(p)
        assert h.ssrc == 50
        audio.append(decode_samples(payload, Encoding.S16BE))
    a = np.concatenate(audio)
    A = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    f = np.fft.rfftfreq(a.size, 1 / 12_000)
    assert abs(f[np.argmax(A)] - 1000.0) < 5  # carrier at dial+1k -> 1 kHz

    beacons = _collect(st, 2.0)
    assert beacons, "no beacons"
    ptype, fields, _ = decode_status(beacons[-1])
    assert ptype == PacketType.STATUS
    assert fields[T.OUTPUT_SSRC] == 50
    assert fields[T.RADIO_FREQUENCY] == 50_000.0
    assert int(fields[T.OUTPUT_SAMPRATE]) == 12_000
    # our dump_text renders the reference's packet without error
    txt = dump_text(beacons[-1])
    assert "50,000" in txt.replace(" ", ",") or "50000" in txt.replace(",", "")


def test_tune_client_commands_reference(ref_radiod, capsys):
    """tune-tpu (our TLV command client) retunes the REFERENCE daemon."""
    from ka9q_radio_tpu.cli.tune import main

    rc = main(["--radio", f"{TAG}-st.local", "--ssrc", "50", "-f", "55k0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "55" in out  # response echoes the new frequency
    # and the reference actually moved: beacons now carry 55 kHz
    st = listen_socket(resolve_dest(f"{TAG}-pcm.local", 5006))
    for pkt in _collect(st, 2.0):
        _, fields, _ = decode_status(pkt)
        if fields.get(T.OUTPUT_SSRC) == 50:
            assert fields[T.RADIO_FREQUENCY] == 55_000.0
            break
    else:
        pytest.fail("no beacon after retune")
    # restore
    main(["--radio", f"{TAG}-st.local", "--ssrc", "50", "-f", "50k0"])


def test_control_client_against_reference(ref_radiod, capsys):
    """control-tpu polls + sets squelch on the reference daemon."""
    from ka9q_radio_tpu.cli.control import main

    rc = main(["--radio", f"{TAG}-st.local", "--ssrc", "50",
               "-c", "sqopen 9", "-c", "poll"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SQUELCH" in out.upper() or "squelch" in out


def test_spectrum_cross_implementation(ref_radiod):
    """Our powers client polls a SPECT channel on the REFERENCE daemon; an
    identical config on OUR daemon must report matching bin powers — a
    cross-implementation spectrum parity check on live wire data."""
    import threading
    from ka9q_radio_tpu.cli.powers import poll_once
    from ka9q_radio_tpu.net.multicast import output_socket
    from ka9q_radio_tpu.net.status import encode_status

    # create a dynamic spectrum channel on the reference (unknown ssrc +
    # preset=spectrum, radio_status.c:92-105)
    dest = resolve_dest(f"{TAG}-st.local", 5006)
    tx = output_socket(dest, 1)
    rx = listen_socket(dest)
    tx.send(encode_status({T.OUTPUT_SSRC: 9001, T.PRESET: "spectrum",
                           T.RADIO_FREQUENCY: 51_000.0,
                           T.RESOLUTION_BW: 1000.0, T.BIN_COUNT: 40}, cmd=True))
    time.sleep(2.0)  # let averaging fill
    f = None
    for _ in range(5):
        f = poll_once(tx, rx, 9001, timeout=2.0)
        if f is not None:
            break
    assert f is not None, "reference spectrum poll failed"
    ref_bins = np.asarray(f[T.BIN_DATA], np.float64)
    assert ref_bins.size >= 40

    # same scene on OUR daemon (offline), via the same TLV surface
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    conf = CONF.replace(f"{TAG}-st.local", "x.local").replace(f"{TAG}-pcm.local", "y.local")
    conf += "\n[sweep]\nmode = spectrum\nfreq = 51k0\nresolution-bw = 1000\nbin-count = 40\n"
    rd = Radiod(load_config(conf), use_network=False)
    # spectrum is poll-gated on BOTH daemons (spectrum.c:54-77); mirror
    # the poll the reference side got
    rd.handle_packet(encode_status({T.OUTPUT_SSRC: 51}, cmd=True))
    for _ in range(30):
        rd.step_block()
    ours = None
    for kind, pkt in reversed(rd._sent):
        if kind != "status":
            continue
        _, fields, _ = decode_status(pkt)
        if fields.get(T.OUTPUT_SSRC) == 51 and T.BIN_DATA in fields:
            ours = np.asarray(fields[T.BIN_DATA], np.float64)
            break
    assert ours is not None
    assert ours.size == 40

    # both see the carrier bin towering over the noise floor at the center
    def db(x):
        return 10 * np.log10(np.maximum(np.asarray(x, np.float64), 1e-30))

    ref_db, our_db = db(ref_bins[:40]), db(ours)
    # BIN_DATA is FFT order on both sides (powers.c: "still in FFT order"):
    # the carrier at the channel center lands in the DC bin
    def near_dc(i, n):
        return min(i, n - i) <= 1

    assert near_dc(int(np.argmax(ref_db)), ref_db.size)
    assert near_dc(int(np.argmax(our_db)), our_db.size)
    # peak power agrees within 1 dB; average noise floor within 3 dB
    assert abs(ref_db.max() - our_db.max()) < 1.0, (ref_db.max(), our_db.max())
    ref_floor = np.median(ref_db)
    our_floor = np.median(our_db)
    assert abs(ref_floor - our_floor) < 3.0, (ref_floor, our_floor)


# ---------------------------------------------------------------------------
# the CONSUMER direction: the reference's own stock clients drive OUR daemon
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def our_radiod():
    """OUR daemon serving on real multicast for the reference clients."""
    import threading
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    tag = f"ours-{os.getpid()}"
    conf = f"""
[global]
hardware = sig_gen
status = {tag}-st.local
data = {tag}-pcm.local
update = 5
advertise = no
sap = no

[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
carrier = 51k
amplitude = -20
noise = -140

[hf]
mode = usb
samprate = 12k
freq = 50k0

[sweep]
mode = spectrum
freq = 51k0
resolution-bw = 1000
bin-count = 40

[wide48]
mode = usb
samprate = 48k
freq = 49k5
ssrc = 150

[op48]
mode = usb
samprate = 48k
freq = 49k0
ssrc = 151
encoding = opus
"""
    rd = Radiod(load_config(conf), use_network=True)
    for _ in range(3):
        rd.step_block()  # compile before going live
    stop = threading.Event()

    def loop():
        while not stop.is_set():
            rd.step_block()

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    yield rd, tag
    stop.set()
    th.join(timeout=5)


def _have_ref_clients():
    return all(os.path.exists(os.path.join(BUILD, x))
               for x in ("tune", "metadump", "powers"))


def test_reference_tune_commands_our_daemon(our_radiod):
    """The STOCK ka9q `tune` binary retunes our daemon."""
    if not _have_ref_clients():
        pytest.skip("reference clients not built")
    rd, tag = our_radiod
    # stock clients resolve names via DNS/mDNS (absent here): hand them the
    # hashed group address directly, like a DNS-less deployment would
    ctl = resolve_dest(f"{tag}-st.local", 5006)[0]
    r = subprocess.run([os.path.join(BUILD, "tune"), "-r", ctl,
                        "-s", "50", "-f", "56k0"],
                       capture_output=True, text=True, timeout=20)
    assert r.returncode == 0, r.stderr[-500:]
    deadline = time.time() + 5
    while time.time() < deadline and rd.chans[50].freq != 56_000.0:
        time.sleep(0.1)
    assert rd.chans[50].freq == 56_000.0
    assert "56" in r.stdout  # tune printed the decoded response
    subprocess.run([os.path.join(BUILD, "tune"), "-r", ctl,
                    "-s", "50", "-f", "50k0"], capture_output=True, timeout=20)


def test_reference_metadump_reads_our_beacons(our_radiod):
    """The STOCK `metadump` decodes our TLV status stream."""
    if not _have_ref_clients():
        pytest.skip("reference clients not built")
    rd, tag = our_radiod
    data_addr = resolve_dest(f"{tag}-pcm.local", 5006)[0]
    r = subprocess.run([os.path.join(BUILD, "metadump"), "-s", "50", "-c", "3",
                        data_addr],
                       capture_output=True, text=True, timeout=30)
    out = r.stdout + r.stderr
    assert "50" in out
    up = out.upper()
    assert "FREQ" in up or "RADIO" in up, out[-800:]
    assert "12" in out  # samprate visible


def test_reference_powers_polls_our_spectrum(our_radiod):
    """The STOCK `powers` polls our spectrum channel and prints bins."""
    if not _have_ref_clients():
        pytest.skip("reference clients not built")
    rd, tag = our_radiod
    ctl = resolve_dest(f"{tag}-st.local", 5006)[0]
    r = subprocess.run([os.path.join(BUILD, "powers"), "-s", "51", "-c", "1",
                        "-T", "5", ctl],
                       capture_output=True, text=True, timeout=30)
    out = r.stdout
    assert r.returncode == 0, (r.stdout[-300:], r.stderr[-300:])
    # rtl_power-style CSV with our 40 bins
    line = [l for l in out.splitlines() if "," in l]
    assert line, out[-500:]
    parts = [p.strip() for p in line[-1].split(",")]
    assert any(p.lstrip("-").replace(".", "").isdigit() and float(p) < 0
               for p in parts[6:] if p), line[-1]


def test_reference_pcmrecord_records_our_audio(our_radiod, tmp_path):
    """The STOCK `pcmrecord` records our daemon's RTP into a WAV with the
    right tone — the audio-consumption direction with an unmodified tool."""
    if not os.path.exists(os.path.join(BUILD, "pcmrecord")):
        pytest.skip("reference pcmrecord not built")
    rd, tag = our_radiod
    data_addr = resolve_dest(f"{tag}-pcm.local", 5004)[0]
    proc = subprocess.Popen([os.path.join(BUILD, "pcmrecord"), "-d", str(tmp_path),
                             "--ssrc", "50", data_addr],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(4.0)
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(5)
    except subprocess.TimeoutExpired:
        proc.terminate()
        proc.wait(5)
    files = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert files, "stock pcmrecord wrote nothing"
    import wave

    wavs = [p for p in files if p.suffix.lower() == ".wav"] or files
    with wave.open(str(wavs[0])) as w:
        fs = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.float64)
    assert fs == 12_000
    assert data.size > 12_000  # at least a second
    A = np.abs(np.fft.rfft(data * np.hanning(data.size)))
    f = np.fft.rfftfreq(data.size, 1 / fs)
    assert abs(f[np.argmax(A)] - 1000.0) < 5  # our USB tone, stock-recorded


def test_reference_monitor_plays_our_audio(our_radiod, tmp_path):
    """The STOCK `monitor` (headless -q --pipe build) plays our daemon's
    streams: 48 kHz PCM (native rate), 12 kHz PCM (through its resampler),
    and Opus (libopus decode) all mix into one 48 kHz output — each channel
    carries a distinct audio tone, so one FFT proves all three paths."""
    if not os.path.exists(os.path.join(BUILD, "monitor")):
        pytest.skip("reference monitor not built")
    rd, tag = our_radiod
    data_addr = resolve_dest(f"{tag}-pcm.local", 5004)[0]
    fifo = tmp_path / "mon.fifo"
    os.mkfifo(fifo)
    errlog = open(tmp_path / "monitor.err", "w")  # NEVER an unread pipe
    proc = subprocess.Popen([os.path.join(BUILD, "monitor"), "-q",
                             "-P", str(fifo), data_addr],
                            stdout=errlog, stderr=errlog)
    fd = os.open(fifo, os.O_RDONLY | os.O_NONBLOCK)
    try:
        import select
        chunks, deadline = [], time.time() + 20
        got = 0
        while time.time() < deadline and got < 48_000 * 2 * 2 * 5:  # 5 s stereo
            r, _, _ = select.select([fd], [], [], 1.0)
            if r:
                try:
                    b = os.read(fd, 65536)
                except BlockingIOError:
                    continue
                if b:
                    chunks.append(b)
                    got += len(b)
        assert got > 48_000 * 2 * 2 * 2, f"only {got} bytes from stock monitor"
    finally:
        os.close(fd)
        proc.terminate()
        try:
            proc.wait(5)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(5)
        errlog.close()
    pcm = np.frombuffer(b"".join(chunks), "<i2").astype(np.float64)
    pcm = pcm[: pcm.size // 2 * 2].reshape(-1, 2).mean(axis=1)  # downmix
    pcm = pcm[pcm.size // 2:]  # settled second half
    A = np.abs(np.fft.rfft(pcm * np.hanning(pcm.size)))
    f = np.fft.rfftfreq(pcm.size, 1 / 48_000)
    floor = np.median(A) + 1e-9
    for tone in (1000.0, 1500.0, 2000.0):  # 12k-PCM, 48k-PCM, Opus sessions
        band = A[(f > tone - 30) & (f < tone + 30)].max()
        assert band > 100 * floor, f"{tone} Hz session missing from the mix"


def test_reference_pcmcat_pipes_our_audio(our_radiod, tmp_path):
    """The STOCK `pcmcat` pipes our RTP stream's PCM to stdout (it
    byte-swaps s16be by payload type automatically)."""
    if not os.path.exists(os.path.join(BUILD, "pcmcat")):
        pytest.skip("reference pcmcat not built")
    rd, tag = our_radiod
    data_addr = resolve_dest(f"{tag}-pcm.local", 5004)[0]
    with open(tmp_path / "cat.err", "w") as err:
        proc = subprocess.Popen([os.path.join(BUILD, "pcmcat"), "-s", "50", data_addr],
                                stdout=subprocess.PIPE, stderr=err)
        try:
            deadline = time.time() + 20
            out = b""
            while time.time() < deadline and len(out) < 2 * 12_000 * 3:
                chunk = proc.stdout.read(4096)
                if not chunk:
                    break
                out += chunk
        finally:
            proc.terminate()
            proc.wait(5)
    # stock pcmcat only byteswaps the STATIC PTs 10/11 (pcmcat.c:221-228);
    # dynamic PTs pass through big-endian
    pcm = np.frombuffer(out, ">i2").astype(np.float64)
    assert pcm.size > 12_000 * 2
    A = np.abs(np.fft.rfft(pcm * np.hanning(pcm.size)))
    f = np.fft.rfftfreq(pcm.size, 1 / 12_000)
    assert abs(f[np.argmax(A)] - 1000.0) < 5  # the 12k USB session's tone


def test_reference_wd_record_records_our_audio(our_radiod, tmp_path):
    """The STOCK wsprdaemon recorder (`wd-record`, 2.7k LoC) consumes our
    daemon's stream and writes a WAV."""
    if not os.path.exists(os.path.join(BUILD, "wd-record")):
        pytest.skip("reference wd-record not built")
    rd, tag = our_radiod
    data_addr = resolve_dest(f"{tag}-pcm.local", 5004)[0]
    proc = subprocess.Popen([os.path.join(BUILD, "wd-record"), "-d", str(tmp_path),
                             "--ssrc", "50", data_addr],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(4.0)
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(5)
    except subprocess.TimeoutExpired:
        proc.terminate()
        proc.wait(5)
    files = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert files, "stock wd-record wrote nothing"
    import wave

    with wave.open(str(files[0])) as w:
        data = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.float64)
        fs = w.getframerate()
    assert data.size > fs  # at least a second
    A = np.abs(np.fft.rfft(data * np.hanning(data.size)))
    f = np.fft.rfftfreq(data.size, 1 / fs)
    assert abs(f[np.argmax(A)] - 1000.0) < 5
