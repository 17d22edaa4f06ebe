"""JVM ImageIO fast path — executor-side sidecar decode for
JPEG/PNG/TIFF (GIF is deliberately NOT routed: multimodal.decode_image).

The decode posture (native_codecs.py) extended to the formats whose C
libraries bind poorly via ctypes (libjpeg's setjmp error ABI, libpng's
struct ABI): every Spark executor host ALREADY runs a JVM, and the JDK's
javax.imageio decoders (IJG libjpeg compiled into the JDK for JPEG, a
pure-Java PNG reader) are already trusted byte-level as this repo's
progressive-JPEG golden (tests/test_multimodal.py).  So the fast path
here is a tiny Java helper class, compiled once per host from the
embedded source below (javac ships with the JDK; if only a JRE is
present the spec decoders remain the path), run as ONE PERSISTENT
SIDECAR SUBPROCESS PER PYTHON WORKER speaking a length-prefixed binary
protocol over its stdin/stdout:

    request:   int32(n) + n blob bytes
    response:  int32(0) + int32(h) + int32(w) + h*w*3 RGB bytes
             | int32(-1) + int32(m) + m UTF-8 error bytes

Why a sidecar and not Py4J: the Py4J gateway lives on the DRIVER — at
cluster scale every decoded pixel would serialize through one driver
socket, a scale-killer.  The sidecar runs next to each Python worker on
the executor host (local[32] here, any cluster there), starts once per
worker process (Spark reuses workers by default), and dies with the
worker's stdin — per-blob cost is two pipe copies, amortizing JVM
startup across the corpus exactly like the Arrow batch amortizes
serialization.

Pixel-exactness contract (what routes here and what must not):
- JPEG: decode is implementation-defined within ISO tolerance (IDCT
  rounding, fancy vs box chroma upsampling differ between the JDK's IJG
  build and operators/jpeg.py), so the sampled cross-check asserts a
  TOLERANCE BAND, not byte equality — see multimodal.decode_image.
- PNG/TIFF: lossless; byte-exact vs the spec decoders REQUIRED at EVERY
  bit depth.  The raw-raster path below handles depth itself: 16-bit
  samples keep the high byte (>>8 on the raster value, matching the
  spec decoders' downconvert — NOT Java's ColorModel v*255/65535
  rounding, which a getRGB() path would apply), and sub-byte gray
  rescales by the same floor formula.  Pinned byte-exact for 16-bit
  gray/RGB(A) and sub-byte gray in tests/test_jvm_codecs.py
  (test_png_variants_byte_exact, test_tiff_variants_byte_exact) — do
  NOT add a caller-side depth
  gate "for safety"; it would silently demote those depths to the spec
  path and cost throughput for nothing.  The ONLY caller gates are
  acceptance-leniency classes, not depth: palette PNG (IHDR color type
  3), jpeg_native_ok, tiff_native_ok (see multimodal.decode_image).
- The Java side reads RAW RASTER BANDS (no ColorSpace conversion): a
  TYPE_BYTE_GRAY getRGB() would run the linear-gray -> sRGB transfer
  function and corrupt gray JPEG values; IndexColorModel (palette) is
  the one safe getRGB() case (pure table lookup) and the only one used.

Reference parity note: the reference system (streamsum) has no media
decode; this layer exists for the 100 TB training-data pipeline goal
(multimodal ingest), with operators/multimodal.py as the routing point.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile
import threading

import numpy as np

_JAVA_SRC = r"""
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.Raster;
import java.io.BufferedInputStream;
import java.io.BufferedOutputStream;
import java.io.ByteArrayInputStream;
import java.io.DataInputStream;
import java.io.DataOutputStream;
import java.io.EOFException;
import java.io.IOException;
import javax.imageio.ImageIO;

public class StreamsumImageIO {
    public static void main(String[] args) throws Exception {
        ImageIO.setUseCache(false); // no temp-file cache: blobs are in-memory
        DataInputStream in =
            new DataInputStream(new BufferedInputStream(System.in, 1 << 16));
        DataOutputStream out =
            new DataOutputStream(new BufferedOutputStream(System.out, 1 << 16));
        while (true) {
            int n;
            try { n = in.readInt(); } catch (EOFException e) { break; }
            if (n < 0) break;              // explicit shutdown
            if (n > (512 << 20)) break;    // protocol desync guard
            byte[] blob = new byte[n];
            in.readFully(blob);
            try {
                BufferedImage img = ImageIO.read(new ByteArrayInputStream(blob));
                if (img == null) throw new IOException("no registered reader");
                int w = img.getWidth(), h = img.getHeight();
                long px = (long) w * h;
                if (px <= 0 || px > (64L << 20))
                    throw new IOException("decoded-dimension cap");
                byte[] rgb = new byte[w * h * 3];
                Raster r = img.getRaster();
                if (img.getColorModel() instanceof IndexColorModel) {
                    // palette: getRGB is a pure table lookup (no
                    // ColorSpace transfer function) — safe and simplest
                    int[] argb = img.getRGB(0, 0, w, h, null, 0, w);
                    for (int i = 0; i < argb.length; i++) {
                        int v = argb[i];
                        rgb[3 * i] = (byte) (v >> 16);
                        rgb[3 * i + 1] = (byte) (v >> 8);
                        rgb[3 * i + 2] = (byte) v;
                    }
                } else if (r.getNumBands() >= 3) {
                    // logical bands 0,1,2 are R,G,B regardless of the
                    // raster's physical byte order (e.g. 3BYTE_BGR);
                    // alpha (band 3) is dropped, matching the spec
                    // decoders' RGB contract.  >8-bit samples keep the
                    // HIGH byte (the spec decoders' 16->8 convention),
                    // never the ColorModel's rounded 255/65535 rescale
                    int[] buf = new int[w * h];
                    for (int b = 0; b < 3; b++) {
                        int ss = r.getSampleModel().getSampleSize(b);
                        int shift = ss > 8 ? ss - 8 : 0;
                        r.getSamples(0, 0, w, h, b, buf);
                        for (int i = 0; i < buf.length; i++)
                            rgb[3 * i + b] = (byte) (buf[i] >> shift);
                    }
                } else {
                    // gray / gray+alpha: raw band 0 replicated — NEVER
                    // getRGB, whose CS_GRAY->sRGB conversion is nonlinear
                    int[] buf = new int[w * h];
                    int ss = r.getSampleModel().getSampleSize(0);
                    int shift = ss > 8 ? ss - 8 : 0;
                    r.getSamples(0, 0, w, h, 0, buf);
                    for (int i = 0; i < buf.length; i++) {
                        byte v = (byte) (buf[i] >> shift);
                        rgb[3 * i] = v;
                        rgb[3 * i + 1] = v;
                        rgb[3 * i + 2] = v;
                    }
                }
                out.writeInt(0);
                out.writeInt(h);
                out.writeInt(w);
                out.write(rgb);
            } catch (Throwable ex) {
                byte[] msg = String.valueOf(ex).getBytes("UTF-8");
                out.writeInt(-1);
                out.writeInt(msg.length);
                out.write(msg);
            }
            out.flush();
        }
    }
}
"""

# bump when _JAVA_SRC changes: the class cache dir is keyed by this
_VERSION = "v1"


def _java_bin(tool: str) -> str | None:
    home = os.environ.get("JAVA_HOME")
    if home and os.path.exists(os.path.join(home, "bin", tool)):
        return os.path.join(home, "bin", tool)
    return shutil.which(tool)


def _class_dir() -> str | None:
    """Compile (once per host, race-safe) and return the directory
    holding StreamsumImageIO.class, or None if no javac is available
    and no prebuilt class exists."""
    import hashlib

    tag = hashlib.sha256(_JAVA_SRC.encode()).hexdigest()[:12]
    final = os.path.join(
        tempfile.gettempdir(), f"streamsum_jvmcodec_{_VERSION}_{tag}"
    )
    if os.path.exists(os.path.join(final, "StreamsumImageIO.class")):
        return final
    javac = _java_bin("javac")
    if javac is None:
        return None
    work = tempfile.mkdtemp(prefix="streamsum_jvmcodec_build_")
    try:
        src = os.path.join(work, "StreamsumImageIO.java")
        with open(src, "w") as fh:
            fh.write(_JAVA_SRC)
        subprocess.run(
            [javac, "-d", work, src],
            check=True, capture_output=True, timeout=120,
        )
        try:
            os.rename(work, final)  # atomic publish; loser of the race cleans up
            return final
        except OSError:
            pass
    except (subprocess.SubprocessError, OSError):
        pass
    finally:
        if os.path.exists(work):
            shutil.rmtree(work, ignore_errors=True)
    if os.path.exists(os.path.join(final, "StreamsumImageIO.class")):
        return final
    return None


class _Sidecar:
    """One persistent JVM decode process; restarted transparently if it
    dies.  A lock serializes the pipe conversation (Python workers are
    single-task, but driver-side tests may share the module)."""

    def __init__(self) -> None:
        self._proc: subprocess.Popen | None = None
        self._lock = threading.Lock()

    def _ensure(self) -> subprocess.Popen:
        if self._proc is not None and self._proc.poll() is None:
            return self._proc
        java = _java_bin("java")
        cdir = _class_dir()
        if java is None or cdir is None:
            raise RuntimeError("JVM ImageIO sidecar unavailable")
        # -Xshare + small heap: 32 sidecars/host must stay cheap; the
        # heap only ever holds one decoded image + one blob
        self._proc = subprocess.Popen(
            [java, "-Djava.awt.headless=true", "-XX:+UseSerialGC",
             "-Xmx256m", "-cp", cdir, "StreamsumImageIO"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        return self._proc

    def decode_rgb(self, blob: bytes) -> np.ndarray:
        with self._lock:
            p = self._ensure()
            try:
                p.stdin.write(struct.pack(">i", len(blob)))
                p.stdin.write(blob)
                p.stdin.flush()
                def read_exact(n: int) -> bytes:
                    # a short read at ANY protocol point means the
                    # sidecar died mid-reply; letting struct.unpack
                    # raise struct.error instead would escape both the
                    # crash recovery below and callers' ValueError
                    # contract (round-10 review fix)
                    out = p.stdout.read(n)
                    if len(out) < n:
                        raise BrokenPipeError("sidecar died mid-reply")
                    return out

                (status,) = struct.unpack(">i", read_exact(4))
                if status != 0:
                    (m,) = struct.unpack(">i", read_exact(4))
                    if not 0 <= m <= (1 << 20):
                        raise BrokenPipeError("sidecar wrote a bad message length")
                    msg = read_exact(m).decode("utf-8", "replace")
                    raise ValueError(f"ImageIO refused the blob: {msg}")
                h, w = struct.unpack(">ii", read_exact(8))
                if not (0 < h <= 65536 and 0 < w <= 65536):
                    raise BrokenPipeError("sidecar wrote bad frame dims")
                need = h * w * 3
                buf = bytearray()
                while len(buf) < need:
                    chunk = p.stdout.read(need - len(buf))
                    if not chunk:
                        raise BrokenPipeError("sidecar died mid-frame")
                    buf += chunk
                return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 3)
            except (BrokenPipeError, OSError):
                # the sidecar crashed (hostile blob hit a JVM bug, or the
                # host killed it): drop it so the next call restarts, and
                # surface the per-blob failure as the malformed-input
                # contract the spec decoders own
                if self._proc is not None:
                    self._proc.kill()
                    self._proc = None
                raise ValueError("JVM sidecar crashed on this blob")


_SIDECAR = _Sidecar()
_AVAILABLE: bool | None = None


def have_jvm_imageio() -> bool:
    """True iff the sidecar can run on this host (java present AND the
    helper class compiled or prebuilt).  Evaluated once per process."""
    global _AVAILABLE
    if _AVAILABLE is None:
        _AVAILABLE = _java_bin("java") is not None and _class_dir() is not None
    return _AVAILABLE


def decode_image_jvm(b: bytes) -> np.ndarray:
    """Decode an image blob to (h, w, 3) uint8 RGB via the JVM sidecar.

    ValueError on refusal/crash (the spec decoders own the
    malformed-input contract — callers fall back), RuntimeError when the
    sidecar is unavailable on this host (callers must check
    have_jvm_imageio() or catch and fall back)."""
    if not have_jvm_imageio():
        raise RuntimeError("JVM ImageIO sidecar unavailable")
    return _SIDECAR.decode_rgb(bytes(b))
