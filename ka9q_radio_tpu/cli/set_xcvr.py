"""set-xcvr-tpu — configure an SA818-class FM transceiver module and key
its PTT (reference: /root/reference/src/set_xcvr.c, the experimental FM
repeater option).

Behavior parity:
  set-xcvr-tpu txon|txoff            key / unkey PTT (GPIO 20, negative
                                     logic: 0 = transmit) and enable the
                                     module (GPIO 21 = 1)
  set-xcvr-tpu -f radio.conf         program the module over its serial
                                     port with the same AT+DMO command
                                     set and [radio] keys as the
                                     reference (wideband/txfreq/rxfreq/
                                     rxtone/txtone/squelch/lowpower/
                                     compression/busylock/txgain/rxgain/
                                     powersave/vox/scramble/serial/sleep)

GPIO goes through the sysfs interface (/sys/class/gpio) instead of
pigpio — TPU hosts are generic Linux, not a Raspberry Pi; the audio
routing alt-modes (GPIO14/15/18) are Pi-specific and N/A here. Both the
GPIO root and the serial opener are injectable for tests (a pty stands
in for the module).
"""
from __future__ import annotations

import argparse
import configparser
import os
import sys
import termios
import time

TX_LOW_POWER = 4
COMPRESSION = 2
BUSY_LOCK = 1

PTT_GPIO = 20  # 0 = transmit, 1 = receive (set_xcvr.c:70)
PD_GPIO = 21  # 1 = enable, 0 = power down


def _gpio_write(pin: int, value: int, root: str = "/sys/class/gpio") -> None:
    """sysfs GPIO write; exports the pin on first use."""
    pin_dir = os.path.join(root, f"gpio{pin}")
    if not os.path.isdir(pin_dir):
        with open(os.path.join(root, "export"), "w") as f:
            f.write(str(pin))
    with open(os.path.join(pin_dir, "direction"), "w") as f:
        f.write("out")
    with open(os.path.join(pin_dir, "value"), "w") as f:
        f.write(str(int(value)))


def _open_serial(port: str) -> int:
    fd = os.open(port, os.O_RDWR | os.O_NOCTTY)
    try:
        t = termios.tcgetattr(fd)
        # cfmakeraw + 9600 baud (set_xcvr.c:196-199)
        t[0] = 0  # iflag
        t[1] = 0  # oflag
        t[2] = termios.CS8 | termios.CREAD | termios.CLOCAL
        t[3] = 0  # lflag
        t[4] = t[5] = termios.B9600
        termios.tcsetattr(fd, termios.TCSANOW, t)
    except termios.error:
        pass  # a pty or pipe stand-in has no line discipline
    return fd


def program(fd: int, cfg: configparser.SectionProxy,
            sleep_s: float = 0.1) -> list[str]:
    """Send the reference's AT+DMO command sequence; returns the commands
    (set_xcvr.c:222-233). Every command ends CRLF."""
    wideband = int(cfg.getboolean("wideband", True))
    txfreq = cfg.getfloat("txfreq", 146.52)
    rxfreq = cfg.getfloat("rxfreq", 146.52)
    rxtone = cfg.getint("rxtone", 0)
    txtone = cfg.getint("txtone", 0)
    sq = cfg.getint("squelch", 3)
    flag = (TX_LOW_POWER if cfg.getboolean("lowpower", False) else 0) \
        | (COMPRESSION if cfg.getboolean("compression", False) else 0) \
        | (BUSY_LOCK if cfg.getboolean("busylock", False) else 0)
    gain = cfg.getint("txgain", 6)
    volume = cfg.getint("rxgain", 1)
    powersave = cfg.getboolean("powersave", False)
    vox = cfg.getint("vox", 8)
    scramble = cfg.getint("scramble", 0)

    cmds = [
        "\r\n",  # flush the serial line (set_xcvr.c:221)
        f"AT+DMOSETGROUP={wideband},{txfreq:.4f},{rxfreq:.4f},"
        f"{rxtone},{sq},{txtone},{flag}\r\n",
        f"AT+DMOSETMIC={gain},{scramble}\r\n",
        f"AT+DMOAUTOPOWCONTR={int(not powersave)}\r\n",  # negative logic
        f"AT+DMOSETVOLUME={volume}\r\n",
        f"AT+DMOSETVOX={vox}\r\n",
    ]
    for c in cmds:
        sys.stderr.write(c)
        os.write(fd, c.encode())
        time.sleep(sleep_s)
    return cmds


def main(argv=None, gpio_root: str = "/sys/class/gpio",
         serial_opener=_open_serial) -> int:
    ap = argparse.ArgumentParser(prog="set-xcvr-tpu", description=__doc__)
    ap.add_argument("-f", "--config", help="INI file with a [radio] section")
    ap.add_argument("command", nargs="?",
                    help="txon/on = key PTT, txoff/off = unkey")
    args = ap.parse_args(argv)

    if args.command:
        try:
            _gpio_write(PD_GPIO, 1, gpio_root)  # enable the module
            if "on" in args.command and "off" not in args.command:
                _gpio_write(PTT_GPIO, 0, gpio_root)  # transmit
            elif "off" in args.command:
                _gpio_write(PTT_GPIO, 1, gpio_root)  # receive
            else:
                print(f"Unknown command {args.command}", file=sys.stderr)
                return 64
        except OSError as e:
            print(f"GPIO unavailable: {e}", file=sys.stderr)
            return 69
        return 0

    if not args.config:
        ap.print_usage(sys.stderr)
        return 64
    ini = configparser.ConfigParser()
    if not ini.read(args.config):
        print(f"Can't load config file {args.config}", file=sys.stderr)
        return 64
    sec = ini["radio"] if "radio" in ini else ini[ini.sections()[0]]
    try:
        _gpio_write(PD_GPIO, 1, gpio_root)
        _gpio_write(PTT_GPIO, 1, gpio_root)  # receive mode while programming
    except OSError:
        pass  # serial-only hosts still get the module programmed
    port = sec.get("serial", "/dev/ttyAMA0")
    sleep_s = sec.getint("sleep", 100_000) / 1e6
    try:
        fd = serial_opener(port)
    except OSError as e:
        print(f"Can't open serial port {port}: {e}", file=sys.stderr)
        return 66
    try:
        program(fd, sec, sleep_s)
    finally:
        os.close(fd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
