#!/bin/sh -x
# Image-size cleanup, invoked at the end of a Dockerfile build
# (analog of /root/reference/seq_docker/cleanup.sh).
apt-get autoremove -y
rm -rf /tmp/* /var/tmp/*
apt-get clean
rm -rf /var/lib/apt/lists/*
