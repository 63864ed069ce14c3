"""``python -m synthetic_datagen_spark --mode …`` — see cli.py."""

import json

from .cli import main

if __name__ == "__main__":
    print(json.dumps(main()))
