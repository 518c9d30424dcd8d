"""CLI integration over real multicast loopback: radiod <-> clients."""
import os
import threading
import time

import numpy as np
import pytest

from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod

# unique stream names per test run to avoid group collisions between workers
_UNIQ = f"{os.getpid()}"
CONF = f"""
[global]
hardware = sig_gen
status = test-{_UNIQ}.local
data = test-pcm-{_UNIQ}.local
mode = usb
update = 5
ttl = 1

[sig_gen]
device = sig_gen
carrier = 201k0
amplitude = -20
noise = -130
samprate = 1m024
real = no

[hf]
mode = usb
samprate = 16k
freq = 200k0

[spect]
mode = spectrum
samprate = 32k
resolution-bw = 500
bin-count = 64
freq = 201k0
ssrc = 9000
"""


@pytest.fixture(scope="module")
def daemon():
    rd = Radiod(load_config(CONF), use_network=True)
    stop = threading.Event()

    def run():
        while not stop.is_set():
            rd.step_block()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # let it compile + run a few blocks
    for _ in range(200):
        if rd.blocks >= 8:
            break
        time.sleep(0.1)
    yield rd
    stop.set()
    t.join(timeout=10)


def test_tune_cli(daemon, capsys):
    from ka9q_radio_tpu.cli.tune import main

    rc = main(["--radio", f"test-{_UNIQ}.local", "--ssrc", "200", "--timeout", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "RADIO_FREQUENCY" in out and "200000" in out


def test_setfilt_cli(daemon, capsys):
    """setfilt-tpu sets LOW/HIGH edges; 'm' prefix = minus, swapped edges
    are reordered (setfilt.c:102-114)."""
    from ka9q_radio_tpu.cli.tune import main_setfilt

    rc = main_setfilt(["--radio", f"test-{_UNIQ}.local", "--ssrc", "200",
                       "--timeout", "5", "2k8", "m2k8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "LOW_EDGE" in out and "-2800" in out and "HIGH_EDGE" in out


def test_control_cli_retune(daemon, capsys):
    from ka9q_radio_tpu.cli.control import main

    rc = main(["--radio", f"test-{_UNIQ}.local", "--ssrc", "200",
               "-c", "f 202k0", "-c", "poll"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "202000" in out
    assert daemon.chans[200].freq == 202_000.0
    # restore
    main(["--radio", f"test-{_UNIQ}.local", "--ssrc", "200", "-c", "f 200k0"])


def test_powers_cli(daemon, capsys):
    from ka9q_radio_tpu.cli.powers import main

    rc = main(["--radio", f"test-{_UNIQ}.local", "--ssrc", "9000", "--timeout", "5"])
    assert rc == 0
    line = capsys.readouterr().out.strip()
    parts = line.split(",")
    assert int(parts[5]) == 64  # bin count
    dbs = np.array([float(x) for x in parts[6:]])
    assert dbs.size == 64
    # carrier at the channel center: max bin near the middle, ~-20 dBFS
    assert abs(int(np.argmax(dbs)) - 32) <= 1
    assert abs(dbs.max() + 20.0) < 3.0


def test_pcmrecord_cli(daemon, tmp_path, capsys):
    from ka9q_radio_tpu.cli.pcmrecord import main

    rc = main(["--data", f"test-pcm-{_UNIQ}.local", "--status", f"test-{_UNIQ}.local",
               "--duration", "3", "--dir", str(tmp_path), "--ssrc", "200"])
    assert rc == 0
    import wave

    paths = sorted(tmp_path.glob("*_ssrc200.wav"))  # timestamped names
    assert paths, list(tmp_path.iterdir())
    path = paths[0]
    with wave.open(str(path)) as w:
        assert w.getframerate() == 16_000
        assert w.getnchannels() == 1
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), "<i2").astype(np.float32) / 32767.0
    assert n > 16_000  # at least a second of audio
    spec = np.abs(np.fft.rfft(data * np.hanning(data.size)))
    f = np.fft.rfftfreq(data.size, 1 / 16_000)
    assert abs(f[np.argmax(spec)] - 1000.0) < 20.0  # the USB tone


def test_monitor_cli(daemon, capsys):
    from ka9q_radio_tpu.cli.monitor import main

    rc = main(["--data", f"test-pcm-{_UNIQ}.local", "--status", f"test-{_UNIQ}.local",
               "--duration", "2", "--quiet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ssrc 200" in out and "drops" in out


def test_control_full_surface(daemon, capsys):
    """The control client reaches the full settable-key surface: preset
    switch, PLL, AGC knobs, squelch, and the panel renderer."""
    from ka9q_radio_tpu.cli.control import main, render_panel, Controller
    from ka9q_radio_tpu.net.status import StatusType as T

    radio = f"test-{_UNIQ}.local"
    rc = main(["--radio", radio, "--ssrc", "200",
               "-c", "mode pm", "-c", "poll"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pm" in out.lower()
    assert daemon.engine.groups[daemon.chans[200].group].spec.demod == "fm"

    rc = main(["--radio", radio, "--ssrc", "200",
               "-c", "mode usb", "-c", "agc off", "-c", "gain 12",
               "-c", "sqopen 9", "-c", "beta 6.5", "-c", "panel"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "== Tuning" in out and "== Demodulator" in out
    ch = daemon.chans[200]
    assert daemon.engine.groups[ch.group].spec.demod == "linear"
    assert ch.kaiser_beta == 6.5

    # render_panel is pure: build a screen from a field dict
    ctl = Controller(radio, 200)
    f, _ = ctl.transact({})
    lines = render_panel(f)
    assert any(ln.startswith("  freq ") and "200,000.000" in ln for ln in lines)
    assert any("edges" in ln for ln in lines)

    # restore for other fixture users
    main(["--radio", radio, "--ssrc", "200", "-c", "agc on", "-c", "f 200k0"])
    capsys.readouterr()


def test_fftgen_warms_production_cache(tmp_path):
    """fft-gen-tpu compiles the SAME programs the daemon will run, so a
    warmed start hits the persistent cache (the FFTW-wisdom analog)."""
    from ka9q_radio_tpu.cli.fftgen import main as fftgen_main
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    conf = """
[global]
hardware = sig_gen
mode = usb
[sig_gen]
device = sig_gen
samprate = 128k
complex = yes
carrier = 33k
amplitude = -20
noise = -140
[hf]
mode = usb
samprate = 8k
freq = 32k0
"""
    cfile = tmp_path / "warm.conf"
    cfile.write_text(conf)
    cache = tmp_path / "wisdom"
    assert fftgen_main([str(cfile), "--wisdom", str(cache)]) == 0
    assert any(cache.iterdir())  # programs persisted
    cfg = load_config(conf)
    cfg.options["wisdom"] = str(cache)
    rd = Radiod(cfg, use_network=False)
    rd.step_block()  # loads from cache (no exception, instant-ish)
    assert rd.blocks == 1

    # the fft.log loop (filter.c:95-101 / fft-gen.c): a slow cold start is
    # recorded, and config-less fft-gen-tpu warms whatever the log names
    cache2 = tmp_path / "wisdom2"
    cache2.mkdir()
    cfg2 = load_config(str(cfile))
    cfg2.options["wisdom"] = str(cache2)
    rd2 = Radiod(cfg2, use_network=False)
    rd2.FFT_LOG_THRESHOLD = 0.0  # CPU compiles are fast; force the log
    rd2.step_block()
    log = (cache2 / "fft.log").read_text()
    assert f"config={cfile}" in log
    assert fftgen_main(["--wisdom", str(cache2)]) == 0  # warm from the log


def test_radiod_sigusr1_enables_stats(tmp_path):
    """SIGUSR1 turns on a running daemon's stats stream without restart
    (main.c:204-212); without it a non-verbose daemon prints nothing."""
    import signal
    import subprocess
    import sys
    import threading
    import time

    conf = tmp_path / "sig.conf"
    conf.write_text("""
[global]
hardware = sig_gen
mode = usb
[sig_gen]
device = sig_gen
samprate = 128k
complex = yes
carrier = 33k
amplitude = -20
[hf]
mode = usb
samprate = 8k
freq = 32k0
""")
    # ignore signals during the wrapper's own slow jax import; main()
    # installs the real handler before the engine build
    code = ("import signal; signal.signal(signal.SIGUSR1, signal.SIG_IGN);"
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from ka9q_radio_tpu.cli.radiod import main; import sys;"
            f"sys.exit(main([{str(conf)!r},'--no-network','--flat-out']))")
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    p = subprocess.Popen([sys.executable, "-c", code], env=env,
                         stderr=subprocess.PIPE, text=True)
    lines = []
    t = threading.Thread(target=lambda: [lines.append(l) for l in p.stderr], daemon=True)
    t.start()
    try:
        deadline = time.time() + 90
        # wait for the ready banner: handlers are armed from then on
        while time.time() < deadline and not any("channels ready" in l for l in lines):
            assert p.poll() is None, f"daemon died: {lines[-5:]}"
            time.sleep(0.5)
        assert any("channels ready" in l for l in lines), lines[-5:]
        while time.time() < deadline and not any("block time avg" in l for l in lines):
            assert p.poll() is None, f"daemon died: {lines[-5:]}"
            p.send_signal(signal.SIGUSR1)
            time.sleep(2.0)
        assert any("block time avg" in l for l in lines), lines[-5:]
    finally:
        p.terminate()
        try:
            p.wait(5)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait(5)


def test_client_flag_parity(tmp_path):
    """Reference flag surface on the clients: tune --mode/--samprate/
    --lifetime create and shape a dynamic channel; powers -f/-b/-w create
    a spectrum sweep from nothing (powers.c); metadump --all polls the
    all-channel dump and --ssrc filters it."""
    import io
    import threading
    import time
    from contextlib import redirect_stdout

    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.cli import tune as tune_cli, powers as powers_cli, metadump as md_cli

    tag = f"flags-{os.getpid()}"
    conf = f"""
[global]
hardware = sig_gen
status = {tag}-st.local
data = {tag}-pcm.local
advertise = no
sap = no
dyn-slots = 2
[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
carrier = 51k
amplitude = -20
[hf]
mode = usb
samprate = 12k
freq = 50k0
"""
    rd = Radiod(load_config(conf), use_network=True)
    for _ in range(2):
        rd.step_block()
    stop = threading.Event()
    th = threading.Thread(target=lambda: [rd.step_block() for _ in iter(lambda: stop.is_set(), True)],
                          daemon=True)
    th.start()
    try:
        radio = f"{tag}-st.local"
        deadline = time.time() + 30
        # tune creates + shapes a dynamic channel. Poll for the APPLIED
        # state, not mere existence: the channel registers in rd.chans
        # before apply_command finishes the restart-class samprate move
        # (wire clients can't observe that window — the status reply is
        # sent after apply — but this in-process peek can).
        def _applied():
            # poll for the LAST key apply_command sets (LIFETIME comes after
            # the samprate move in the key loop) so a mid-apply peek can't
            # race the asserts below
            ch = rd.chans.get(900)
            return (ch is not None and ch.samprate == 24_000
                    and ch.lifetime_init == 60 * 50)
        while time.time() < deadline and not _applied():
            tune_cli.main(["--radio", radio, "--ssrc", "900", "-f", "49k5",
                           "-m", "am", "-r", "24k", "--lifetime", "60",
                           "--timeout", "1"])
        ch = rd.chans[900]
        assert ch.preset == "am" and ch.samprate == 24_000
        assert ch.lifetime_init == 60 * 50
        # powers creates a spectrum sweep from nothing and prints bins
        buf = io.StringIO()
        rc = 1
        while time.time() < deadline and rc != 0:
            with redirect_stdout(buf):
                rc = powers_cli.main(["--radio", radio, "--ssrc", "901",
                                      "-f", "51k0", "-b", "24", "-w", "500",
                                      "--count", "1", "--timeout", "2"])
        assert rc == 0
        line = [l for l in buf.getvalue().splitlines() if "," in l][-1]
        assert int(line.split(",")[5]) == 24  # our bin count
        assert rd.chans[901].preset == "spectrum"
        # metadump --all sees both channels' dumps, --ssrc filters
        buf = io.StringIO()
        with redirect_stdout(buf):
            md_cli.main(["--radio", radio, "--all", "--ssrc", "900",
                         "--count", "2", "--timeout", "5"])
        out = buf.getvalue()
        assert "OUTPUT_SSRC = 900" in out and "OUTPUT_SSRC = 901" not in out
    finally:
        stop.set()
        th.join(timeout=5)


def test_showsig_polls_channel(daemon, capsys):
    """show-sig-tpu polls the channel and prints live levels
    (show-sig.c poll loop)."""
    from ka9q_radio_tpu.cli.showsig import main

    rc = main(["--radio", f"test-{_UNIQ}.local", "--ssrc", "200",
               "--count", "2", "--interval", "0.2", "--timeout", "5"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "Hz" in l]
    assert len(lines) == 2
    # the -20 dBFS carrier at 201k lands in the 200k USB channel: real
    # signal levels, not zeros
    assert "200000 Hz" in lines[0]
    assert "n0" in lines[0] and "bb" in lines[0]
    bb = float(lines[0].split("bb")[1].split("dB")[0])
    n0 = float(lines[0].split("n0")[1].split("dB/Hz")[0])
    assert bb > n0, (bb, n0)  # baseband power above the noise density


def test_showpkt_accounts_drops_and_dupes(capsys):
    """show-pkt-tpu counts packets/drops/dupes per SSRC from a live RTP
    stream (show-pkt.c loss stats)."""
    import threading
    from ka9q_radio_tpu.cli.showpkt import main
    from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, encode_samples
    from ka9q_radio_tpu.net.multicast import resolve_dest, output_socket

    stream = f"showpkt-{_UNIQ}.local"
    th = threading.Thread(
        target=main, args=([ "--data", stream, "--interval", "0.5",
                             "--duration", "3"],), daemon=True)
    th.start()
    time.sleep(0.6)
    tx = output_socket(resolve_dest(stream, 5004))
    payload = encode_samples(np.zeros(240, np.float32), Encoding.S16BE)
    seqs = [0, 1, 2, 5, 5, 6]  # 3,4 lost => 2 drops; second 5 is a dup
    ts = 0
    for s in seqs:
        tx.send(RtpHeader(type=11, seq=s, timestamp=s * 240, ssrc=77).pack() + payload)
        time.sleep(0.02)
    th.join(timeout=5)
    tx.close()
    lines = [l for l in capsys.readouterr().out.splitlines() if "ssrc" in l]
    assert lines, "show-pkt printed nothing"
    last = lines[-1]
    assert "77" in last
    # 6 packets seen, 2 dropped, 1 dup
    assert "pkts        6" in last.replace("pkts  ", "pkts ") or "6" in last.split("pkts")[1].split("drops")[0]
    assert int(last.split("drops")[1].split("dupes")[0]) == 2
    assert int(last.split("dupes")[1].split("bytes")[0]) == 1

def test_radiod_restart_on_fatal(tmp_path):
    """`restart = 0` re-execs the daemon in a fresh interpreter on a fatal
    error (systemd Restart=always analog; also the only recovery from a
    compile-poisoned jax process). A feeder-less config is fatal on the
    first block, so each generation prints its banner then restarts."""
    import subprocess
    import sys
    import threading
    import time

    conf = tmp_path / "restart.conf"
    conf.write_text("""
[global]
hardware = feeder
restart = 0
[feeder]
samprate = 128k
complex = yes
[hf]
mode = usb
samprate = 8k
freq = 32k0
""")
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "KA9Q_RESTART_COUNT": "0"}
    p = subprocess.Popen(
        [sys.executable, "-m", "ka9q_radio_tpu.cli.radiod", str(conf)],
        env=env, stderr=subprocess.PIPE, text=True)
    lines = []
    t = threading.Thread(target=lambda: [lines.append(l) for l in p.stderr], daemon=True)
    t.start()
    try:
        deadline = time.time() + 180
        while time.time() < deadline and not any("restart #2" in l for l in lines):
            if p.poll() is not None:
                break
            time.sleep(0.5)
        restarts = [l for l in lines if "restart #" in l]
        assert any("restart #2" in l for l in restarts), lines[-6:]
        assert sum("channels ready" in l for l in lines) >= 2, lines[-6:]
    finally:
        p.kill()
        p.wait(5)


def test_panel_digit_columns_and_windows():
    """The TUI's digit-cursor map and the control.c window set (Tuning/
    Input/Signal/Filtering/Demodulator/Options/Output/RTP/Presets)."""
    from ka9q_radio_tpu.cli.control import (
        render_panel, freq_digit_columns, FREQ_ROW, FREQ_COL, FREQ_WIDTH,
        PANEL_PRESETS)
    from ka9q_radio_tpu.net.status import StatusType as T

    freq = 14_074_000.0
    cols = dict((int(round(np.log10(s))), c) for c, s in freq_digit_columns(freq)
                if s >= 1)
    # the formatted string "  14,074,000.000": digits map right-to-left
    s = f"{freq:>{FREQ_WIDTH},.3f}"
    for place, col in cols.items():
        assert s[col - FREQ_COL].isdigit()
    # value check: the 10MHz digit is '1', units digit is '0'
    assert s[cols[7] - FREQ_COL] == "1"
    assert s[cols[0] - FREQ_COL] == "0"

    lines = render_panel({T.OUTPUT_SSRC: 5, T.RADIO_FREQUENCY: freq,
                          T.DEMOD_TYPE: 0, T.AGC_ENABLE: True,
                          T.INPUT_SAMPRATE: 129_600_000, T.FE_ISREAL: True})
    text = "\n".join(lines)
    for win in ("Tuning", "Input", "Signal", "Filtering", "Demodulator",
                "Options", "Output", "RTP/Status", "Presets"):
        assert f"== {win} " in text, win
    assert "[a:agc]" in text  # enabled flags render bracketed
    assert " l:pll " in text  # disabled flags unbracketed
    for p in PANEL_PRESETS:
        assert p in lines[-1]
    # the freq line is where the cursor map points
    assert lines[FREQ_ROW].startswith("  freq ")


def test_set_xcvr(tmp_path):
    """set-xcvr-tpu: the reference's SA818 programmer + PTT keyer
    (set_xcvr.c) — AT+DMO command sequence over a pty, GPIO writes
    through an injectable sysfs root."""
    import os
    import pty

    from ka9q_radio_tpu.cli import set_xcvr

    # --- serial programming against a pty standing in for the module
    conf = tmp_path / "xcvr.conf"
    conf.write_text("""
[radio]
serial = IGNORED
txfreq = 147.36
rxfreq = 146.76
txtone = 123
squelch = 2
lowpower = yes
busylock = yes
txgain = 7
vox = 0
sleep = 1000
""")
    mfd, sfd = pty.openpty()
    rc = set_xcvr.main(["-f", str(conf)], gpio_root=str(tmp_path / "nogpio"),
                       serial_opener=lambda port: sfd)
    assert rc == 0
    data = os.read(mfd, 4096).decode()
    os.close(mfd)
    # pty output processing may duplicate CRs; normalize before splitting
    lines = [l for l in data.replace("\r", "").split("\n") if l]
    # same sequence and field order as set_xcvr.c:222-233
    assert lines[0] == "AT+DMOSETGROUP=1,147.3600,146.7600,0,2,123,5"
    assert lines[1] == "AT+DMOSETMIC=7,0"
    assert lines[2] == "AT+DMOAUTOPOWCONTR=1"
    assert lines[3] == "AT+DMOSETVOLUME=1"
    assert lines[4] == "AT+DMOSETVOX=0"

    # --- PTT keying through a fake sysfs gpio tree
    root = tmp_path / "gpio"
    for pin in (20, 21):
        (root / f"gpio{pin}").mkdir(parents=True)
    (root / "export").write_text("")
    assert set_xcvr.main(["txon"], gpio_root=str(root)) == 0
    assert (root / "gpio20" / "value").read_text() == "0"  # transmit
    assert (root / "gpio21" / "value").read_text() == "1"  # enabled
    assert set_xcvr.main(["txoff"], gpio_root=str(root)) == 0
    assert (root / "gpio20" / "value").read_text() == "1"  # receive
    assert set_xcvr.main(["bogus"], gpio_root=str(root)) == 64
