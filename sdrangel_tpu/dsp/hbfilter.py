"""Half-band FIR filter designs.

The reference keeps per-order coefficient tables in
sdrbase/dsp/hbfiltertraits.{h,cpp} (orders 16/32/48/64/80/96/112/128; each
order N stores the N/4 unique non-zero side coefficients; the full impulse
response is the symmetric half-band FIR of length N-1 whose even-offset taps
are zero except the centre tap of 0.5).

We keep those exact coefficient *values* (filter design data, needed for
golden/SNR parity with reference output — hbfiltertraits.cpp:25-173) and also
provide an independent Kaiser windowed-sinc half-band designer for arbitrary
orders.

Usage map (reference):
  order 64 — device decimator cascades (decimators.h:23)
  order 48 — DownChannelizer stages   (downchannelizer.h:28)
  order 96 — UpChannelizer stages     (upchannelizer.h:32)
  orders 64/32/16 — Tx interpolator cascade stages (interpolators.h:27-29)
"""

from __future__ import annotations

import functools

import numpy as np

# Unique side coefficients c[0..N/4-1], outermost first, innermost (adjacent to
# the centre tap) last. Values transcribed from hbfiltertraits.cpp ("Firwin as
# in https://www.dsprelated.com/showcode/270.php" / Remez for order 64).
HB_COEFFS: dict[int, list[float]] = {
    16: [
        -0.0052391810630145275,
        0.0232111017863650751,
        -0.0761058457486735451,
        0.3076987787367443383,
    ],
    32: [
        -0.0018878783958199373,
        0.0038624783041994004,
        -0.0082424665965482504,
        0.0159471139705940346,
        -0.0286765592339759019,
        0.0507185615622293764,
        -0.0980159074728618324,
        0.3159417644358786248,
    ],
    48: [
        -0.0011627994808655962,
        0.0017451165792459335,
        -0.0029357205890606303,
        0.0048726090910227891,
        -0.0077313759655872928,
        0.0117637971494846689,
        -0.0173810771817523163,
        0.0253500636065296450,
        -0.0373266939135983855,
        0.0576685041500848358,
        -0.1024912545928038654,
        0.3173768238826674692,
    ],
    64: [
        -0.0004653050334792540,
        0.0007120490624526884,
        -0.0012303473710125559,
        0.0019716520179919018,
        -0.0029947484165425580,
        0.0043703902150498061,
        -0.0061858352927315653,
        0.0085554408639278122,
        -0.0116397924445187356,
        0.0156852221106748395,
        -0.0211070832238078286,
        0.0286850846890029897,
        -0.0400956173930921908,
        0.0597215923200692667,
        -0.1036982054813635201,
        0.3175014394028848885,
    ],
    80: [
        -0.0001054430663706785,
        0.0001895717826405602,
        -0.0003519516996893228,
        0.0005975111594421821,
        -0.0009524124279789792,
        0.0014474605824692796,
        -0.0021186428821101787,
        0.0030082068742630901,
        -0.0041664004891296359,
        0.0056547140936428538,
        -0.0075518323360079902,
        0.0099644038858163180,
        -0.0130470841719700411,
        0.0170422818715445859,
        -0.0223637819225956901,
        0.0297925991327811050,
        -0.0410092859102263174,
        0.0604034694948822268,
        -0.1041194584045879307,
        0.3176437752925042046,
    ],
    96: [
        -0.0000243052463317894,
        0.0000503567741519848,
        -0.0001002354600628052,
        0.0001801275832684543,
        -0.0003014864432246497,
        0.0004783148860127732,
        -0.0007274200147704493,
        0.0010686503612886001,
        -0.0015251456116906108,
        0.0021238131085570462,
        -0.0028960654265650426,
        0.0038789688077727476,
        -0.0051173875903961540,
        0.0066675444490017317,
        -0.0086031967328669932,
        0.0110268456349653828,
        -0.0140900919878225728,
        0.0180336055419063578,
        -0.0232708957455770062,
        0.0305843805330435620,
        -0.0416576245224431485,
        0.0608846679850302969,
        -0.1044156487571061137,
        0.3177437550265513333,
    ],
    112: [
        -0.0000057182612173498,
        0.0000134089330475143,
        -0.0000285019056923813,
        0.0000540489980941086,
        -0.0000947833751586818,
        0.0001567867952902223,
        -0.0002476681450895876,
        0.0003767405865262860,
        -0.0005551920408570068,
        0.0007962529081739060,
        -0.0011153731476064449,
        0.0015304714714705458,
        -0.0020622467141092529,
        0.0027347048425079849,
        -0.0035759786171320283,
        0.0046196952795832949,
        -0.0059072308383088714,
        0.0074914857942512255,
        -0.0094433233524672672,
        0.0118628557280401076,
        -0.0149000865720731561,
        0.0187949228094094409,
        -0.0239611153097040799,
        0.0311823240686547251,
        -0.0421443341867254184,
        0.0612443342926724393,
        -0.1046363792986205604,
        0.3178181645034457437,
    ],
    128: [
        -0.0000013530084481064,
        0.0000035468835939308,
        -0.0000080263259193853,
        0.0000160249362715262,
        -0.0000293930772937944,
        0.0000506245785103060,
        -0.0000829848508757282,
        0.0001306421953216197,
        -0.0001988007175677746,
        0.0002938302746977690,
        -0.0004233934809845499,
        0.0005965709177428589,
        -0.0008239883872841065,
        0.0011179618447797631,
        -0.0014926744261021872,
        0.0019644262679035678,
        -0.0025520032927806384,
        0.0032772538071471993,
        -0.0041660018952565702,
        0.0052495120038521465,
        -0.0065668614662222156,
        0.0081688408784787812,
        -0.0101245136956070701,
        0.0125326183062810584,
        -0.0155423066893098580,
        0.0193932322698959943,
        -0.0244995384963461564,
        0.0316459368298866381,
        -0.0425198999626832386,
        0.0615208850123762294,
        -0.1048057030317238042,
        0.3178751792920155861,
    ],
}

# Fixed-point Q shift per order (hbfiltertraits.h:30-112), recorded for the
# integer parity mode.
HB_SHIFT: dict[int, int] = {16: 12, 32: 12, 48: 12, 64: 12, 80: 14, 96: 16, 112: 18, 128: 20}

#: Orders used by reference subsystems.
DECIMATORS_ORDER = 64  # decimators.h:23
DOWNCHANNELIZER_ORDER = 48  # downchannelizer.h:28
UPCHANNELIZER_ORDER = 96  # upchannelizer.h:32
INTERPOLATORS_ORDERS = (64, 32, 16)  # interpolators.h:27-29


@functools.lru_cache(maxsize=None)
def hb_taps(order: int) -> np.ndarray:
    """Full impulse response of the order-N half-band filter.

    Length N-1, float32. Nonzero taps at odd offsets from the centre plus the
    0.5 centre tap; DC gain == 2*sum(c) + 0.5 ≈ 1.0.
    """
    c = np.asarray(HB_COEFFS[order], dtype=np.float64)
    n_side = len(c)  # == order // 4
    length = order - 1
    h = np.zeros(length, dtype=np.float64)
    centre = length // 2  # == order//2 - 1
    h[centre] = 0.5
    for k in range(n_side):
        off = 2 * (n_side - k) - 1  # innermost coefficient sits at offset 1
        h[centre - off] = c[k]
        h[centre + off] = c[k]
    return h.astype(np.float32)


def design_halfband(order: int, beta: float = 9.0) -> np.ndarray:
    """Independent Kaiser windowed-sinc half-band design (no scipy).

    Returns the full (order-1)-tap impulse response with exact zeros at even
    offsets and 0.5 at the centre; DC gain 1.0.
    """
    length = order - 1
    centre = length // 2
    n = np.arange(length, dtype=np.float64) - centre
    # Ideal half-band lowpass: cutoff fs/4 -> h[n] = 0.5*sinc(n/2)
    with np.errstate(invalid="ignore", divide="ignore"):
        h = 0.5 * np.sinc(n / 2.0)
    h[centre] = 0.5
    w = np.kaiser(length, beta)
    h = h * w
    # Re-impose exact half-band structure and unity DC gain.
    h[(np.arange(length) - centre) % 2 == 0] = 0.0
    h[centre] = 0.5
    h = h / h.sum()
    return h.astype(np.float32)


def hb_poly_even_odd(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Polyphase split of the half-band taps for stride-2 filtering.

    Returns (h_even, h_odd) such that for y[m] = sum_k h[k] x[2m - k + D]
    the even branch is just the centre tap (delay) and the odd branch is the
    dense c-coefficient FIR over odd samples — the structure the reference
    exploits in IntHalfbandFilterEO::doFIR (inthalfbandfiltereo.h:792-870)
    and the one our Pallas kernel uses.
    """
    h = hb_taps(order)
    return h[::2].copy(), h[1::2].copy()
