#!/usr/bin/env python
"""YouTube faceset downloader + frame extractor (host-side utility).

Equivalent of ``/root/reference/facesets/download_from_list_parallel.py:
32-110`` and ``get_videos_in_channel_scrapetube_batch.py:7-28``: download
videos from an id list with pytube, extract frames at 0.1 fps with ffmpeg,
per-video error isolation, thread-parallel.

These are offline host tools (SURVEY §2.8); network access and
pytube/scrapetube are optional — the CLI degrades with a clear message
when they are unavailable (this build container has no egress).
"""

import argparse
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor


def download_and_extract(video_id: str, out_dir: str, fps: float) -> bool:
    try:
        from pytube import YouTube
    except ImportError:
        raise SystemExit("pytube is not installed; this offline container "
                         "cannot download videos")
    try:
        yt = YouTube(f"https://www.youtube.com/watch?v={video_id}")
        stream = yt.streams.filter(progressive=True, file_extension="mp4")\
            .order_by("resolution").desc().first()
        video_path = stream.download(output_path=out_dir,
                                     filename=f"{video_id}.mp4")
    except Exception as e:   # per-video isolation (reference :50-59)
        print(f"[skip] {video_id}: {e}")
        return False
    frames_dir = os.path.join(out_dir, video_id)
    os.makedirs(frames_dir, exist_ok=True)
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", video_path, "-vf", f"fps={fps}",
             os.path.join(frames_dir, "%06d.jpg")],
            check=True, capture_output=True)
    except Exception as e:
        print(f"[frames failed] {video_id}: {e}")
        return False
    finally:
        if os.path.exists(video_path):
            os.remove(video_path)
    return True


def list_channel_videos(channel_url: str):
    try:
        import scrapetube
    except ImportError:
        raise SystemExit("scrapetube is not installed")
    return [v["videoId"] for v in scrapetube.get_channel(
        channel_url=channel_url)]


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--id_list", required=True)
    d.add_argument("--out_dir", required=True)
    d.add_argument("--fps", type=float, default=0.1)
    d.add_argument("--n_threads", type=int, default=8)
    c = sub.add_parser("channel")
    c.add_argument("--channel_url", required=True)
    c.add_argument("--out_file", required=True)
    args = ap.parse_args()

    if args.cmd == "channel":
        ids = list_channel_videos(args.channel_url)
        with open(args.out_file, "w") as f:
            f.write("\n".join(ids) + "\n")
        print(f"wrote {len(ids)} video ids")
        return

    ids = open(args.id_list).read().splitlines()
    os.makedirs(args.out_dir, exist_ok=True)
    with ThreadPoolExecutor(args.n_threads) as pool:
        results = list(pool.map(
            lambda vid: download_and_extract(vid, args.out_dir, args.fps),
            ids))
    print(f"downloaded {sum(results)}/{len(ids)} videos")


if __name__ == "__main__":
    main()
