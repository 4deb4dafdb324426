"""Folder upload CLI (reference scripts/huggingface/upload_hf.py)."""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repo_id", type=str, required=True)
    p.add_argument("--folder_path", type=str, required=True)
    p.add_argument("--repo_type", type=str, default="model")
    args = p.parse_args()

    from huggingface_hub import HfApi

    HfApi().upload_folder(
        repo_id=args.repo_id, folder_path=args.folder_path,
        repo_type=args.repo_type,
    )


if __name__ == "__main__":
    main()
