"""ZPAQ Level-2 model lookup tables.

These are *format constants* of the public-domain ZPAQ Level-2 standard
(http://mattmahoney.net/zpaq/). Every conforming codec must reproduce them
bit-exactly, because archive contents depend on the exact integer values.

Tables
------
- ``SNS``       : the 256-state bit-history automaton, 4 bytes per state:
                  (next state if 0, next state if 1, n0, n1).
                  Reference semantics: /root/reference/ZSFX/libzpaq.h:1095-1111.
- ``SQUASHT``   : squash(x) = floor(32768/(1+exp(-x/64))) for x in [-2048,2047].
- ``STRETCHT``  : stretch(p) ~= round(64*ln((p+0.5)/(32767.5-p))), inverse of squash.
- ``DT``        : CM training reciprocal table, dt[i] = (2^17)/(2i+3)*2.
- ``DT2K``      : MATCH confidence table, dt2k[i] = 2048/i (dt2k[0]=0).

The squash/stretch/dt tables are generated from their defining formulas and
verified against the standard's checksums (see ``self_test``); the reference
freezes the same values as data (libzpaq.cpp:1264-1753).  SNS is embedded as
packed data (it is specified as an explicit table in the ZPAQ spec).
"""

from __future__ import annotations

import base64
import hashlib
import math

import numpy as np

# ZPAQ component-type codes (header byte 0 of each component).
NONE, CONS, CM, ICM, MATCH, AVG, MIX2, MIX, ISSE, SSE = range(10)

#: bytes used to encode each component type in the COMP header section
COMPSIZE = (0, 2, 3, 2, 3, 4, 6, 6, 3, 5)

COMPNAME = ("", "const", "cm", "icm", "match", "avg", "mix2", "mix", "isse", "sse")

# The 1024-byte bit-history state table (ZPAQ L2 spec, section on ICM/ISSE
# components).  sha256 self-checked below.
_SNS_B85 = (
    "0RjL30|fy91O@;B2MGcI2nzuL2nzuL3Jd@O4G#kV4iN$Y4iN$Y5EB6c5EB6c5)=Rf6&C~m78wHp78wHp"
    "7#jit7#jit8XW-x8XW-x93B7!A0Y(*AR`0;AR`0;A|(R?A|(R?Bqss`Bqss`CMf{~CMf{~C@KI2D<K8|"
    "EH4ECEH4ECE-?fGE-?fGFf#)KFf#)KGBpAOGBpAOG&cbSG&cbSC^!HHIV}eOIxhwRIxhwRJU;~jJU;~j"
    "K0yQnK0yQnKtlrrKtlrrLPY`vLPY`vG)DmjG)DmjHb?*mNjnGtN<9YwN<9YwOg{z!Og{z!PEiE|PEiE|"
    "P*Vg1P*Vg1QdI*5QdI*5LRSI?LRSI?L|Fj`L|Fj`Mp^&}TRRB=Tulf8Tulf8UQY)CUQY)CU{MAGU{MAG"
    "Vr2ycVr2ycWM>2gWM>2gQfUJQQfUJQRBHkURBHkUR&4<YR&4<YMs5HJZ#xPAa7_sTa7_sTa$yJpa$yJp"
    "bYlktbYlktK4k_3K4k_3P*Vj3P*Vj3WJ3f7WJ3f7W_JSzW_JSzXn6t%Xn6t%R(k;nR(k;nMtlGYeLD*P"
    "eoYDieoYDifME#&fME#&JU<8nJU<8nLPY}zLPY}zXoCU?XoCU?R)qlyR)qlyMuq?jhdT@ah)oLth)oLt"
    "ieU-@ieU-@XpI62XpI62R*wM-R*wM-Mvwpukvk0ll1&T&l1&T&lwk`3lwk`3XqN&DXqN&DR+#||R+#||"
    "Mw$Q(n>!8woJ|b@oJ|b@o?#3Eo?#3EXrTfOXrTfOR-*w8R-*w8Mx+1^r8^G*rcDk3rcDk3s9_BPs9_BP"
    "XsZGZXsZGZR;>XJR;>XJMy>!4uR9O`uuTsEuuTsEvSAJavSAJaXte?kXte?kR<{8UR<{8UMz{bFxjPX6"
    "x=j!Px=j!PN?{KIN?{KIXjuXeXjuXeR=WWZR=WWZM!WzKy*m;BzD*GUR=)ueM!*0P!8;QG!c7tZR>J`j"
    "M#KOU!8;TH#Z40dR>lDnM#KOV$4wLgR>%Pq$xRgjR>}bt%S{#mR?Gnw%}o~pR?Yzz&rKKsR?q<$(M=fv"
    "R?-0((@h!yR@4C+)lC}#R@MO<*G(J&R@ea?*-ae*R@wm_+f5z;R@?y|-Ax|>R^9<0-%TI^R^S03;Y}d{"
    "R^kC6<4qy~R^$O9<xL|2R^|aC=S?I5R_FmF=}jd8R_XyI>rEyBR_p;L?M){ER_*~O?@cHHR`3BR@l7cK"
    "R`LNU^GzxNR`dZX^-U`QR`vla_f0GTR`>xd`AsbWR{8-g`%NwZR{Q}j{Y@_cR{jAm{Y@|dR{jAn00000"
)
_SNS_SHA256 = "96ad98352f52637468ddfdb8c06c6cbd020d824cb8eb5a0023772210f745f358"

SNS = np.frombuffer(base64.b85decode(_SNS_B85), dtype=np.uint8).copy()
SNS.setflags(write=False)


def _build_squasht() -> np.ndarray:
    t = np.empty(4096, dtype=np.uint16)
    for i in range(4096):
        t[i] = int(32768.0 / (1 + math.exp((i - 2048) * (-1.0 / 64))))
    return t


def _build_stretcht() -> np.ndarray:
    t = np.empty(32768, dtype=np.int16)
    for i in range(32768):
        t[i] = int(math.log((i + 0.5) / (32767.5 - i)) * 64 + 0.5 + 100000) - 100000
    return t


def _build_dt() -> np.ndarray:
    return np.array([(1 << 17) // (i * 2 + 3) * 2 for i in range(1024)], dtype=np.int32)


def _build_dt2k() -> np.ndarray:
    t = np.zeros(256, dtype=np.int32)
    for i in range(1, 256):
        t[i] = 2048 // i
    return t


SQUASHT = _build_squasht()
STRETCHT = _build_stretcht()
DT = _build_dt()
DT2K = _build_dt2k()
for _t in (SQUASHT, STRETCHT, DT, DT2K):
    _t.setflags(write=False)


def squash(x: int) -> int:
    """x in [-2048, 2047] -> p in [0, 32767]."""
    return int(SQUASHT[x + 2048])


def stretch(p: int) -> int:
    """p in [0, 32767] -> x in [-2047, 2047]."""
    return int(STRETCHT[p])


def st_next(state: int, y: int) -> int:
    """Next bit-history state after observing bit y."""
    return int(SNS[state * 4 + y])


def st_cminit(state: int) -> int:
    """Initial probability of a 1, scaled by 2^23, for a bit-history state."""
    n0 = int(SNS[state * 4 + 2])
    n1 = int(SNS[state * 4 + 3])
    return ((n1 * 2 + 1) << 22) // (n0 + n1 + 1)


CMINIT = np.array([st_cminit(s) for s in range(256)], dtype=np.uint32)
CMINIT.setflags(write=False)


def self_test() -> None:
    """Verify all tables against the format's reference checksums.

    The two rolling checksums are the ones the reference asserts at model
    init (libzpaq.cpp:1744-1753); they pin every entry of squash/stretch.
    """
    assert hashlib.sha256(SNS.tobytes()).hexdigest() == _SNS_SHA256
    stsum = 0
    for i in range(32767, -1, -1):
        stsum = (stsum * 3 + int(STRETCHT[i])) & 0xFFFFFFFF
    sqsum = 0
    for i in range(4095, -1, -1):
        sqsum = (sqsum * 3 + int(SQUASHT[i])) & 0xFFFFFFFF
    assert stsum == 3887533746, stsum
    assert sqsum == 2278286169, sqsum
    # spot-check the automaton: state 0 is the empty history (n0=n1=0)
    assert tuple(SNS[:4]) == (1, 2, 0, 0)
    assert st_cminit(0) == 1 << 22


if __name__ == "__main__":
    self_test()
    print("tables OK")
