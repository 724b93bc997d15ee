"""M4 channel-table reformat (extensions/cm/preprocess.py:192-296) —
the DS example from the reference's own docstring, plus the repair and
removal branches."""

from __future__ import annotations

from loganalyzer_spark.operators.chantable import reformat_ds_chan_table

START = "^Active Downstream Channel Diagnostics:"
TITLE = r"^[ \t]+(-+[ \t]+)+-+[ \t]*$"
END = "^End of table"

TABLE = [
    "Some normal log",
    "Active Downstream Channel Diagnostics:",
    "",
    "  rx id  dcid    freq, hz  qam  fec   snr, dB   power, dBmV  modulation",
    "                            plc  prfA",
    "  -----  ----  ----------  ---  ---  ---------  -----------  ----------",
    "      0*    1   300000000   y    y          35            3       Qam64",
    "      1     2   308000000   y    y          34            4      Qam256",
    "     32    66   698000000   y    y          35            1    OFDM PLC",
    "      2     3   310000000   y    y          33            2    Qam2566junk",
    "      3     4   312000000   y    y",
    "Non-nested interleaved line",
    "      4     5   314000000   y    y          31            5    Xbroken",
    "End of table marker",
    "Another normal log",
]


def test_ds_chan_table_reformat(spark):
    df = spark.createDataFrame(
        [(0, i, s) for i, s in enumerate(TABLE)],
        "doc_id: long, line_no: long, content: string",
    )
    out = reformat_ds_chan_table(df, START, TITLE, END)
    got = [r["content"] for r in out.orderBy("line_no").collect()]
    assert got == [
        "Some normal log",
        # header + title + start: dropped; data rows cooked:
        "DS channel status rxid 0* dcid 1 freq 300000000 qam y fec y"
        " snr 35 power 3 mod Qam64",
        "DS channel status rxid 1 dcid 2 freq 308000000 qam y fec y"
        " snr 34 power 4 mod Qam256",
        # OFDM PLC keeps QAM arity via underscore (preprocess.py:269-272)
        "DS channel status rxid 32 dcid 66 freq 698000000 qam y fec y"
        " snr 35 power 1 mod OFDM_PLC",
        # glued column repaired from leading chars (preprocess.py:252-267)
        "DS channel status rxid 2 dcid 3 freq 310000000 qam y fec y"
        " snr 33 power 2 mod Qam256",
        # short row dropped; interleaved non-nested line kept verbatim:
        "Non-nested interleaved line",
        # unrecoverable mod column: row dropped; end line kept:
        "End of table marker",
        "Another normal log",
    ]


def test_ds_chan_table_two_tables_reset(spark):
    """A second table re-arms header handling (hdr_done resets on start)."""
    rows = TABLE + TABLE[1:8]  # second table right after the first
    df = spark.createDataFrame(
        [(0, i, s) for i, s in enumerate(rows)],
        "doc_id: long, line_no: long, content: string",
    )
    out = reformat_ds_chan_table(df, START, TITLE, END)
    cooked = [
        r["content"]
        for r in out.orderBy("line_no").collect()
        if r["content"].startswith("DS channel status")
    ]
    # 4 cooked rows from table one, 2 from the truncated second table
    assert len(cooked) == 6


US_TABLE = [
    "Active Upstream Channels:",
    "                    rng     pwr        frequency     symbols   phy  ok tx",
    " txid  ucid  dcid   sid     dBmv          MHz          sec    type  data?",
    " ----  ----  ----  ------  -----    ---------------  -------  ----  -----",
    "    0   101     1     0x2      18             9.000  5120000     3      y",
    "    8   149     1     0x2      18   63.700 - 78.450        0     5      y",
    "    2   103     1     0x2      18            15.400  5120000     3  extra n trail",
    "    3   104     1     0x2      18            16.000  5120000     3  bad zz",
    "End of table marker",
]


def test_us_chan_table_reformat(spark):
    from loganalyzer_spark.operators.chantable import reformat_us_chan_table

    df = spark.createDataFrame(
        [(0, i, s) for i, s in enumerate(US_TABLE)],
        "doc_id: long, line_no: long, content: string",
    )
    out = reformat_us_chan_table(
        df, "^Active Upstream Channels:", TITLE, END
    )
    got = [r["content"] for r in out.orderBy("line_no").collect()]
    assert got == [
        # SC-QAM: freq_end repeats freq_start (us_chan_log_scqam)
        "US channel status txid 0 ucid 101 dcid 1 rngsid 0x2 power 18"
        " freqstart 9.000 freqend 9.000 symrate 5120000 phytype 3 txdata y",
        # OFDMA: range split by '-' (preprocess.py:322-331)
        "US channel status txid 8 ucid 149 dcid 1 rngsid 0x2 power 18"
        " freqstart 63.700 freqend 78.450 symrate 0 phytype 5 txdata y",
        # legacy table: tx-data recovered from the glued second sub-token
        "US channel status txid 2 ucid 103 dcid 1 rngsid 0x2 power 18"
        " freqstart 15.400 freqend 15.400 symrate 5120000 phytype 3 txdata n",
        # unrecoverable legacy column: dropped; end line kept
        "End of table marker",
    ]
