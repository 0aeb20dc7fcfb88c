"""SmallFloat/NORM_TABLE bit-exactness, incl. a live cross-check against a
Java float reimplementation of the published formulas (run with the
sandbox JDK) — TestBM25Similarity.java:24-74 sanity properties plus
cross-language float32 equivalence."""

import shutil
import subprocess

import numpy as np
import pytest

from lucene_solr_spark.oracle import (
    NORM_TABLE,
    byte315_to_float,
    float_to_byte315,
    norm_byte_for_length,
)

JAVA_SNIPPET = r"""
public class FloatCheck {
  static byte floatToByte315(float f) {
    int bits = Float.floatToRawIntBits(f);
    int smallfloat = bits >> (24-3);
    if (smallfloat <= ((63-15)<<3)) return (bits<=0) ? (byte)0 : (byte)1;
    if (smallfloat >= ((63-15)<<3) + 0x100) return -1;
    return (byte)(smallfloat - ((63-15)<<3));
  }
  static float byte315ToFloat(byte b) {
    if (b == 0) return 0.0f;
    int bits = (b&0xff) << (24-3);
    bits += (63-15) << 24;
    return Float.intBitsToFloat(bits);
  }
  public static void main(String[] a) {
    // norm bytes for lengths 1..600
    for (int len = 1; len <= 600; len++) {
      byte nb = floatToByte315(1f / (float) Math.sqrt(len));
      System.out.println("nb " + len + " " + (nb & 0xff));
    }
    // NORM_TABLE
    float[] t = new float[256];
    for (int i = 1; i < 256; i++) {
      float f = byte315ToFloat((byte)i);
      t[i] = 1.0f / (f*f);
    }
    t[0] = 1.0f / t[255];
    for (int i = 0; i < 256; i++)
      System.out.println("nt " + i + " " + Float.floatToRawIntBits(t[i]));
    // idf and cache floats for a sample config
    long docCount = 2973, df = 117; double avgdlD = 31.417;
    float idf = (float) Math.log(1 + (docCount - df + 0.5D)/(df + 0.5D));
    System.out.println("idf " + Float.floatToRawIntBits(idf));
    float k1 = 1.2f, b = 0.75f; float avgdl = (float) avgdlD;
    for (int i = 0; i < 256; i++) {
      float c = k1 * ((1 - b) + b * t[i] / avgdl);
      System.out.println("c " + i + " " + Float.floatToRawIntBits(c));
    }
    // full score: weightValue * freq / (freq + norm)
    float wv = idf * (k1 + 1);
    int[] tfs = {1, 2, 3, 7, 50};
    for (int tf : tfs)
      for (int nb = 0; nb < 256; nb += 17) {
        float c = k1 * ((1 - b) + b * t[nb] / avgdl);
        float s = wv * tf / (tf + c);
        System.out.println("s " + tf + " " + nb + " " + Float.floatToRawIntBits(s));
      }
  }
}
"""


def test_norm_table_sanity():
    assert NORM_TABLE.shape == (256,)
    assert np.all(np.isfinite(NORM_TABLE)) and np.all(NORM_TABLE > 0)
    assert NORM_TABLE[0] == np.float32(1.0) / NORM_TABLE[255]
    # decoded lengths decrease as byte grows past 124 region etc: f is
    # strictly increasing over bytes 1..255
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    assert np.all(np.diff(f[1:].astype(np.float64)) > 0)


def test_known_values():
    assert float_to_byte315(np.float32(1.0))[0] == 124
    assert float_to_byte315(np.float32(0.0))[0] == 0
    assert float_to_byte315(np.float32(-1.0))[0] == 0
    assert float_to_byte315(np.float32(np.inf))[0] == 255
    assert norm_byte_for_length(0) == 0
    assert norm_byte_for_length(1) == 124  # 1/sqrt(1) = 1.0


def test_roundtrip_monotone_quantization():
    lengths = np.arange(1, 5000)
    from lucene_solr_spark.oracle import norm_bytes_for_lengths

    nbs = norm_bytes_for_lengths(lengths)
    # norm byte non-increasing with length (longer doc -> smaller 1/sqrt)
    assert np.all(np.diff(nbs.astype(np.int32)) <= 0)
    # collisions exist (8-bit quantization) — required by FIXTURES.md §3
    assert len(np.unique(nbs)) < 200


@pytest.mark.skipif(shutil.which("java") is None, reason="no JDK")
def test_cross_language_float_exactness(tmp_path):
    src = tmp_path / "FloatCheck.java"
    src.write_text(JAVA_SNIPPET)
    out = subprocess.run(
        ["java", str(src)], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    nb_java = {}
    nt_java = {}
    cache_java = {}
    scores_java = {}
    idf_java = None
    for line in out.stdout.splitlines():
        parts = line.split()
        if parts[0] == "nb":
            nb_java[int(parts[1])] = int(parts[2])
        elif parts[0] == "nt":
            nt_java[int(parts[1])] = int(parts[2])
        elif parts[0] == "idf":
            idf_java = int(parts[1])
        elif parts[0] == "c":
            cache_java[int(parts[1])] = int(parts[2])
        elif parts[0] == "s":
            scores_java[(int(parts[1]), int(parts[2]))] = int(parts[3])

    from lucene_solr_spark.oracle import norm_bytes_for_lengths

    lengths = np.arange(1, 601)
    ours = norm_bytes_for_lengths(lengths)
    for i, ln in enumerate(lengths):
        assert int(ours[i]) == nb_java[int(ln)], f"norm byte mismatch len={ln}"

    ours_bits = NORM_TABLE.view(np.int32)
    for i in range(256):
        assert int(ours_bits[i]) == nt_java[i], f"NORM_TABLE[{i}] bits mismatch"

    # idf/cache/score bit-exact
    doc_count, df, avgdl_d = 2973, 117, 31.417
    idf = np.float32(np.log(1 + (doc_count - df + 0.5) / (df + 0.5)))
    assert int(idf.view(np.int32)) == idf_java
    k1, b = np.float32(1.2), np.float32(0.75)
    avgdl = np.float32(avgdl_d)
    cache = (k1 * ((np.float32(1) - b) + b * NORM_TABLE / avgdl)).astype(np.float32)
    cbits = cache.view(np.int32)
    for i in range(256):
        assert int(cbits[i]) == cache_java[i], f"cache[{i}] mismatch"
    wv = np.float32(idf * (k1 + np.float32(1)))
    for (tf, nb), jbits in scores_java.items():
        s = np.float32(wv * np.float32(tf) / (np.float32(tf) + cache[nb]))
        assert int(s.view(np.int32)) == jbits, f"score tf={tf} nb={nb}"
