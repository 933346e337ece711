#!/bin/sh
# ------------------------------------------------------------------
# Download the IDEE datasets from the Bonn research-data repository
# (https://doi.org/10.60507/FK2/RD9E33); file ids per dataset as in the
# reference repo's scripts/download_*.sh. Usage:
#   ./download_datasets.sh synthetic|cerra|noaa_cerra|era5_land|noaa_cordex
# ------------------------------------------------------------------
set -e
BASE=https://bonndata.uni-bonn.de/api/access/datafile

case "${1:-all}" in
  synthetic)
    wget --continue "$BASE/7506" -O Synthetic.7z ;;
  cerra)
    wget --continue "$BASE/7509" -O CERRA.7z.001
    wget --continue "$BASE/7510" -O CERRA.7z.002 ;;
  noaa_cerra)
    wget --continue "$BASE/7507" -O NOAA_CERRA.7z ;;
  noaa_cordex)
    wget --continue "$BASE/7508" -O NOAA_CORDEX.7z ;;
  era5_land)
    wget --continue "$BASE/7513" -O AFR-11.7z
    wget --continue "$BASE/7514" -O CAS-11.7z
    wget --continue "$BASE/7515" -O EAS-11.7z
    wget --continue "$BASE/7516" -O EUR-11.7z
    wget --continue "$BASE/7517" -O NAM-11.7z
    wget --continue "$BASE/7518" -O SAM-11.7z ;;
  *)
    echo "usage: $0 synthetic|cerra|noaa_cerra|era5_land|noaa_cordex"; exit 1 ;;
esac
