"""Snapshot/file download CLI (reference scripts/huggingface/download_hf.py).

Fetches model checkpoints (FLUX, reward models, tokenizer assets) at deploy
time — the training environment itself has no egress.
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repo_id", type=str, required=True)
    p.add_argument("--local_dir", type=str, required=True)
    p.add_argument("--repo_type", type=str, default="model")
    p.add_argument("--file_name", type=str, default=None,
                   help="download a single file instead of a snapshot")
    args = p.parse_args()

    from huggingface_hub import hf_hub_download, snapshot_download

    if args.file_name:
        path = hf_hub_download(
            repo_id=args.repo_id, filename=args.file_name,
            repo_type=args.repo_type, local_dir=args.local_dir,
        )
    else:
        path = snapshot_download(
            repo_id=args.repo_id, repo_type=args.repo_type,
            local_dir=args.local_dir,
        )
    print(path)


if __name__ == "__main__":
    main()
