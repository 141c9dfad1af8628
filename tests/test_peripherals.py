"""Board-peripheral behavioral models (heartbeat LED, quadrature PIO,
PCA9685 motor driver, ESP AT bridge) vs the firmware semantics."""

import numpy as np

from slamrs_tpu.io.peripherals import (EspAtBridge, Heartbeat, LedStatus,
                                       Motor, MotorDriver, Pca9685,
                                       QuadratureDecoder)


def test_heartbeat_blink_cadence():
    """heartbeat.rs:36-43/79-91: Fast toggles every tick of the 10 Hz
    loop, Slow every 10; colors are divided by SCALE=8."""
    hb = Heartbeat()
    assert hb.tick() == (0, 0, 0)  # Off default

    hb.set_status(LedStatus.blinking("green", "fast"))
    states = [hb.tick() for _ in range(4)]
    assert states[0] == (0, 31, 0)  # 255 // 8 = 31
    assert states[1] == (0, 0, 0)
    assert states[2] == (0, 31, 0)

    hb = Heartbeat()
    hb.set_status(LedStatus.blinking("red", "slow"))
    states = [hb.tick() for _ in range(25)]
    # toggles on ticks 0, 10, 20
    assert states[0] == (31, 0, 0)
    assert all(s == (31, 0, 0) for s in states[:10])
    assert all(s == (0, 0, 0) for s in states[10:20])
    assert states[20] == (31, 0, 0)

    hb.set_status(LedStatus.on("white"))
    assert hb.tick() == (31, 31, 31)
    hb.set_status(LedStatus.off())
    assert hb.tick() == (0, 0, 0)


def _quad_wave(steps, direction=1):
    """Gray-code A/B sequence for `steps` quarter-steps (the PIO jump
    table counts B-leading as +1: 00->10 is plus1 with state = B<<1|A,
    encoder.pio jump table rows)."""
    seq = [(0, 0), (0, 1), (1, 1), (1, 0)]
    if direction < 0:
        seq = seq[::-1]
    for i in range(steps):
        yield seq[(i + 1) % 4]


def test_quadrature_counts_and_wraps():
    """encoder.pio jump table: +-1 per valid transition, 0 for
    double-transitions; 32-bit wrapping count like the PIO X register."""
    q = QuadratureDecoder(0, 0)
    for a, b in _quad_wave(40):
        q.sample(a, b)
    assert q.signed == 40
    for a, b in _quad_wave(100, direction=-1):
        q.sample(a, b)
    # direction reversal: the first reversed sample re-walks one state
    assert -62 <= q.signed <= -58
    # invalid double-transition (00 -> 11) counts zero
    q2 = QuadratureDecoder(0, 0)
    q2.sample(1, 1)
    assert q2.signed == 0
    # wraparound below zero mirrors the u32 DMA mirror (00 -> 01, i.e.
    # A leading, is minus1 in the jump table)
    q3 = QuadratureDecoder(0, 0)
    q3.sample(1, 0)
    assert q3.count == 0xFFFFFFFF and q3.signed == -1


def test_pca9685_motor_semantics():
    """motor.rs: prescale math, channel maps, take-low-first direction
    sequencing, signed speed round-trip through the registers."""
    pca = Pca9685()
    drv = MotorDriver(pca, frequency_hz=1600.0)
    # prescale = 25e6/4096/(1600*0.9) - 1 + 0.5 rounding (motor.rs:73-78)
    assert pca.prescale == int(25000000.0 / 4096.0 / (1600.0 * 0.9)
                               - 1.0 + 0.5)
    m0 = drv.motor(0)
    assert (m0.in1, m0.in2, m0.pwm_channel) == (10, 9, 8)
    m1 = drv.motor(1)
    assert (m1.in1, m1.in2, m1.pwm_channel) == (11, 12, 13)
    try:
        drv.motor(0)
        assert False, "MotorAlreadyTaken expected"
    except ValueError:
        pass

    pca.writes.clear()
    m0.set_speed_signed(1200)
    # forward: in2 low FIRST, then in1 high, then duty
    assert pca.writes == [(9, 0, 0), (10, 0, 4095), (8, 0, 1200)]
    assert m0.signed_speed == 1200
    m0.set_speed_signed(-300)
    assert m0.signed_speed == -300
    m0.set_speed_signed(0)
    assert m0.signed_speed == 0
    m0.set_direction("brake")
    assert m0.signed_speed == 0


def test_esp_at_bridge_bringup_sequence():
    """esp.rs:26-200: exact AT command order, LED stages, and
    connect/disconnect events."""
    events = []
    br = EspAtBridge(on_event=events.append)
    assert br.led.status == LedStatus.blinking("blue", "fast")

    br.feed(b"ready\r\n")
    assert br.sent == [b"AT+SYSMSG=0\r\n", b"AT+CWSTATE?\r\n"]
    assert br.led.status == LedStatus.blinking("blue", "medium")

    br.feed(b"WIFI CONNECTED\r\nWIFI GOT IP\r\n")
    assert br.sent[2:] == [b'AT+MDNS=1,"robot","_tcp",8080\r\n',
                           b"AT+CIPMUX=1\r\n",
                           b"AT+CIPSERVERMAXCONN=1\r\n",
                           b"AT+CIPSERVER=1,8080\r\n"]
    assert br.state == "listening"
    assert br.led.status == LedStatus.blinking("green", "slow")

    br.feed(b"0,CONNECT\r\n")
    assert br.is_connected and events == ["connected"]
    assert br.led.status == LedStatus.blinking("green", "fast")
    br.feed(b"0,CLOSED\r\n")
    assert not br.is_connected and events == ["connected", "disconnected"]
    assert br.led.status == LedStatus.blinking("green", "slow")


def test_virtual_robot_drives_pca9685_and_led():
    """The virtual robot's control loop goes through the register-level
    motor driver and the LED mirrors the connection state."""
    from slamrs_tpu.io.message import CommandMessage
    from slamrs_tpu.io.virtual_robot import VirtualRobot

    r = VirtualRobot()
    r.connect()
    assert r.led.status == LedStatus.blinking("green", "fast")
    r.handle_command(CommandMessage.drive(0.3, 0.3))
    r.step(0.5)  # several control ticks
    # PI pushed a forward command through the PCA9685 registers
    assert r.pca.duty(r._motor_left.in1) == 4095  # forward direction
    assert r.pca.duty(r._motor_left.pwm_channel) > 0
    assert r._speed_l > 0
    # LED heartbeat ticked with the control loop (fast blink toggles)
    assert r.led.rgb in ((0, 31, 0), (0, 0, 0))
    r.disconnect()
    assert r.led.status == LedStatus.blinking("green", "slow")
